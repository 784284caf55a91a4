"""Regenerate the golden parity fixtures from the live torch reference.

    python -m tests.capture_golden [case ...]

Requires torch and the reference checkout (see tests/_reference.py). For
each case in tests/golden.py this synthesizes the deterministic weights,
runs the torch reference forward, and writes
``tests/fixtures/golden/<name>.npz`` (state-dict shapes + reference
outputs). Run from the repo root after any change to the reference surface
or to the case definitions; commit the refreshed fixtures.
"""

from __future__ import annotations

import sys

from tests.golden import CASES, make_weights, save_fixture


def main(argv):
    names = argv or sorted(CASES)
    for name in names:
        case = CASES[name]
        shapes = case.ref_shapes()
        weights = make_weights(case, shapes)
        outputs = case.ref_forward(weights)
        path = save_fixture(name, shapes, outputs)
        sizes = {k: tuple(v.shape) for k, v in outputs.items()}
        print(f"captured {name}: {sizes} -> {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
