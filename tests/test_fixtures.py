"""Frozen-fixture guard: the in-repo oracles must keep producing exactly the
outputs frozen in tests/golden/fixtures/ — catches accidental oracle edits
or environment drift that would silently move the compatibility contract."""

from pathlib import Path

import numpy as np
import pytest

from tests.golden.gen_fixtures import FIXTURE_DIR, compute_all


@pytest.mark.parametrize("name", sorted(p.stem for p in FIXTURE_DIR.glob("*.npy")))
def test_oracle_matches_frozen_fixture(name):
    current = compute_all()[name]
    frozen = np.load(FIXTURE_DIR / f"{name}.npy")
    np.testing.assert_allclose(current, frozen, rtol=1e-12, atol=1e-13)


def test_all_fixtures_present():
    assert len(list(FIXTURE_DIR.glob("*.npy"))) == len(compute_all())
