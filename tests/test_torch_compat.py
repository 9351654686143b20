"""Torch interop bridge: tensor-in/tensor-out parity with the numpy facade,
device/dtype handling, nn.Module transforms."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import mfcc_rust_tpu.api as api  # noqa: E402
import mfcc_rust_tpu.torch_compat as tc  # noqa: E402


@pytest.fixture(scope="module")
def sig(rng):
    return rng.normal(0, 0.1, 15357).astype(np.float32)


def test_mfcc_matches_numpy_facade(sig):
    out = tc.mfcc(torch.from_numpy(sig), 16000)
    assert isinstance(out, torch.Tensor)
    np.testing.assert_array_equal(out.numpy(), api.mfcc(sig, 16000))


def test_tuple_return_mfe(sig):
    feats, energies = tc.mfe(torch.from_numpy(sig), 16000)
    gf, ge = api.mfe(sig, 16000)
    np.testing.assert_array_equal(feats.numpy(), gf)
    np.testing.assert_array_equal(energies.numpy(), ge)


def test_dict_return_extract(sig):
    out = tc.extract(torch.from_numpy(sig), 16000, which=("mfcc", "ssc", "mfe"))
    gold = api.extract(sig, 16000, which=("mfcc", "ssc", "mfe"))
    assert set(out) == set(gold)
    np.testing.assert_array_equal(out["mfcc"].numpy(), gold["mfcc"])
    np.testing.assert_array_equal(out["ssc"].numpy(), gold["ssc"])
    np.testing.assert_array_equal(out["mfe"][0].numpy(), gold["mfe"][0])
    np.testing.assert_array_equal(out["mfe"][1].numpy(), gold["mfe"][1])


def test_librosa_pipelines(sig):
    t = torch.from_numpy(sig)
    np.testing.assert_array_equal(
        tc.mel_spectrogram_librosa(t, sr=22050).numpy(),
        api.mel_spectrogram_librosa(sig, sr=22050),
    )
    np.testing.assert_array_equal(
        tc.mfcc_librosa(t, sr=22050).numpy(), api.mfcc_librosa(sig, sr=22050)
    )


def test_batched_and_noncontiguous(sig):
    batch = np.stack([sig, sig * 0.5])
    t = torch.from_numpy(np.ascontiguousarray(batch.T)).T  # non-contiguous view
    assert not t.is_contiguous()
    np.testing.assert_array_equal(tc.mfcc(t, 16000).numpy(), api.mfcc(batch, 16000))


def test_half_precision_input_upcasts(sig):
    out = tc.mfcc(torch.from_numpy(sig).to(torch.bfloat16), 16000)
    assert out.dtype == torch.float32
    gold = api.mfcc(
        torch.from_numpy(sig).to(torch.bfloat16).float().numpy(), 16000
    )
    np.testing.assert_array_equal(out.numpy(), gold)


def test_postprocessing_ops(sig):
    feat = api.mfcc(sig, 16000)
    t = tc.to_torch(feat)  # facade output may be non-writable; to_torch copies
    np.testing.assert_array_equal(tc.cmvn(t, True).numpy(), api.cmvn(feat, True))
    np.testing.assert_array_equal(tc.delta(t).numpy(), api.delta(feat))
    np.testing.assert_array_equal(
        tc.preemphasis(torch.from_numpy(sig)).numpy(), api.preemphasis(sig)
    )


def test_resample(sig):
    from mfcc_rust_tpu.ops.resample import resample as jres

    out = tc.resample(torch.from_numpy(sig), 22050, 16000)
    np.testing.assert_array_equal(out.numpy(), np.asarray(jres(sig, 22050, 16000)))


def test_numpy_input_passes_through(sig):
    out = tc.mfcc(sig, 16000)  # plain ndarray in -> tensor out (no device hint)
    assert isinstance(out, torch.Tensor)
    np.testing.assert_array_equal(out.numpy(), api.mfcc(sig, 16000))


def test_nn_module_transforms(sig):
    t = torch.from_numpy(sig)
    mel = tc.MelSpectrogram(sr=22050, n_mels=64)
    assert "n_mels=64" in repr(mel)
    np.testing.assert_array_equal(
        mel(t).numpy(), api.mel_spectrogram_librosa(sig, sr=22050, n_mels=64)
    )
    mfcc_mod = tc.MFCC(sr=22050, n_mfcc=13)
    np.testing.assert_array_equal(
        mfcc_mod(t).numpy(), api.mfcc_librosa(sig, sr=22050, n_mfcc=13)
    )
    sp_mod = tc.SpeechpyMFCC(16000, num_cepstral=13)
    np.testing.assert_array_equal(sp_mod(t).numpy(), api.mfcc(sig, 16000))
    # composes in a pipeline container and has no trainable state
    seq = torch.nn.Sequential(mfcc_mod)
    assert list(seq.parameters()) == []
    np.testing.assert_array_equal(seq(t).numpy(), mfcc_mod(t).numpy())
