"""Torch-free parity tier: replay the committed golden fixtures.

Each case regenerates the reference's weights deterministically from the
fixture's state-dict shapes (tests/golden.py), runs THIS framework's twin
module, and compares against the stored reference outputs — the same
behavioural contract as tests/test_parity*.py, with no torch and no
/root/reference needed at test time.

Fixtures are (re)captured with ``python -m tests.capture_golden`` when the
live reference is available; ``test_fixture_fresh_vs_live`` (parity tier)
guards against stale fixtures.
"""

import numpy as np
import pytest

from tests.golden import CASES, load_fixture, make_weights

_FAST = {"two_way_transformer", "prompt_image_encoder_all", "sam_vit"}


def _params(name):
    marks = [pytest.mark.fast] if name in _FAST else []
    slow = {"canonical_full_forward", "sam_released_full_forward"}
    if name in slow:
        marks.append(pytest.mark.slow)
    return pytest.param(name, marks=marks)


@pytest.mark.parametrize("name", [_params(n) for n in sorted(CASES)])
def test_golden_replay(name):
    case = CASES[name]
    fixture = load_fixture(name)
    if fixture is None:
        pytest.skip(f"no fixture for {name}; run python -m tests.capture_golden")
    shapes, ref_outputs = fixture
    weights = make_weights(case, shapes)
    ours = case.our_forward(weights)
    case.compare(ours, ref_outputs)


@pytest.mark.parity
@pytest.mark.parametrize("name", sorted(CASES))
def test_fixture_fresh_vs_live(name):
    """With the live reference available, the committed fixture must match a
    fresh capture bit-exactly — catches drift in either the reference or the
    case definitions."""
    pytest.importorskip("torch")
    case = CASES[name]
    fixture = load_fixture(name)
    if fixture is None:
        pytest.skip(f"no fixture for {name}; run python -m tests.capture_golden")
    shapes, stored = fixture
    assert shapes == case.ref_shapes()
    fresh = case.ref_forward(make_weights(case, shapes))
    assert sorted(fresh) == sorted(stored)
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(fresh[k]), stored[k],
                                      err_msg=f"{name}:{k}")
