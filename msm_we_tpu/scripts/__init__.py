"""Standalone utility scripts (reference C23).

The reference ships ``run_msmWE_flux.py`` (manual pipeline -> pickle; covered
here by the ``msm-we-tpu build`` CLI) and a bit-rotted
``collectCoordinates.py`` (post-hoc coordinate augmentation). This package
provides a working augmentation utility.
"""
from .collect_coordinates import augment_west_h5  # noqa: F401
