#!/usr/bin/env python
"""Generate static deeptime goldens for the TICA/VAMP cross-check.

Run this ON A MACHINE WITH deeptime INSTALLED (any version >= 0.4; the
estimators used are ``deeptime.decomposition.TICA`` / ``VAMP``, the ones the
reference calls in ``msm_we/_hamsm/_dimensionality.py:288-311``), then commit
the output file::

    python scripts/gen_deeptime_goldens.py
    git add tests/goldens/deeptime_ar1.npz

``tests/test_tica_vamp_goldens.py::test_committed_deeptime_goldens`` then
asserts this package's streamed-moments estimators against the actual
library's numbers (until the file exists it documents the constraint by
skipping with an explicit reason).

Why this script exists: the build environment has no network egress and
deeptime ships no wheel into it (``pip download deeptime`` ->
"No matching distribution found", recorded in PARITY.md), so the goldens
cannot be produced in-tree. The fixture below is bit-reproducible: the same
seeded AR(1) construction the live tests use.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_tica_vamp_goldens import LAMS, SVARS, _rotated_ar1  # noqa: E402


def main():
    from deeptime.decomposition import TICA, VAMP

    X0, Xt, R = _rotated_ar1(200_000, LAMS, SVARS, seed=42)

    tica = TICA(lagtime=1, var_cutoff=None, scaling="kinetic_map")
    t_model = tica.fit((X0, Xt)).fetch_model()
    vamp = VAMP(lagtime=1, var_cutoff=None, scaling=None)
    v_model = vamp.fit((X0, Xt)).fetch_model()

    probe = X0[:500]
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens", "deeptime_ar1.npz"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        fixture_seed=42,
        n_steps=200_000,
        lams=LAMS,
        svars=SVARS,
        tica_singular_values=np.asarray(t_model.singular_values),
        tica_projection=np.asarray(t_model.transform(probe)),
        vamp_singular_values=np.asarray(v_model.singular_values),
        vamp_projection=np.asarray(v_model.transform(probe)),
        deeptime_version=np.array(
            __import__("deeptime").__version__, dtype="U32"
        ),
    )
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
