"""Native runtime: WAV codec round-trips and the prefetch loader."""

import numpy as np
import pytest

from mfcc_rust_tpu.runtime import AudioLoader, native_available, read_wav, wav_info, write_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("wavs")
    lengths = [1600, 16000, 7777, 3201]
    clips = []
    for i, n in enumerate(lengths):
        clip = (0.5 * np.sin(2 * np.pi * 220 * (i + 1) * np.arange(n) / 16000)).astype(
            np.float32
        )
        write_wav(str(d / f"clip{i}.wav"), clip, 16000)
        clips.append(clip)
    return d, clips


def test_native_compiles():
    assert native_available(), "g++ native runtime failed to build"


def test_roundtrip_mono(wav_dir):
    d, clips = wav_dir
    for i, clip in enumerate(clips):
        out, sr = read_wav(str(d / f"clip{i}.wav"))
        assert sr == 16000
        assert out.shape == clip.shape
        np.testing.assert_allclose(out, clip, atol=1.0 / 10000)


def test_wav_info(wav_dir):
    d, clips = wav_dir
    info = wav_info(str(d / "clip1.wav"))
    assert info.sample_rate == 16000
    assert info.channels == 1
    assert info.bits_per_sample == 16
    assert info.frames == len(clips[1])


def test_stereo_mixdown(tmp_path, rng):
    stereo = rng.normal(0, 0.2, (5000, 2)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "st.wav")
    write_wav(p, stereo, 8000)
    mono, sr = read_wav(p, mix_mono=True)
    assert sr == 8000 and mono.shape == (5000,)
    np.testing.assert_allclose(mono, stereo.mean(axis=1), atol=1.0 / 8000)
    both, _ = read_wav(p, mix_mono=False)
    assert both.shape == (5000, 2)


def test_max_frames_truncation(wav_dir):
    d, clips = wav_dir
    out, _ = read_wav(str(d / "clip1.wav"), max_frames=1000)
    assert out.shape == (1000,)
    np.testing.assert_allclose(out, clips[1][:1000], atol=1.0 / 10000)


def test_loader_yields_all(wav_dir):
    d, clips = wav_dir
    paths = [str(d / f"clip{i}.wav") for i in range(len(clips))]
    seen = {}
    order = []
    for idx, samples, sr, meta in AudioLoader(paths, n_threads=3, capacity=2):
        assert sr == 16000
        assert meta.pcm16_exact  # write_wav emits mono PCM16
        seen[idx] = samples
        order.append(idx)
    # deterministic in-path-order emission (reorder buffer)
    assert order == list(range(len(clips)))
    for i, clip in enumerate(clips):
        assert seen[i].shape == clip.shape
        np.testing.assert_allclose(seen[i], clip, atol=1.0 / 10000)


def test_loader_decode_error(tmp_path, wav_dir):
    d, clips = wav_dir
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")
    paths = [str(d / "clip0.wav"), str(bad)]
    with pytest.raises(IOError):
        list(AudioLoader(paths, n_threads=1))


def test_scipy_fallback_consistency(wav_dir, monkeypatch):
    """The Python fallback must agree with the native codec."""
    d, clips = wav_dir
    import mfcc_rust_tpu.runtime.wav as wavmod

    native, _ = read_wav(str(d / "clip2.wav"))
    monkeypatch.setattr(wavmod, "load_native", lambda: None)
    fallback, _ = wavmod.read_wav(str(d / "clip2.wav"))
    np.testing.assert_allclose(native, fallback, atol=1e-6)
