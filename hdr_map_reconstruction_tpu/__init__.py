"""Alias package: `hdr_map_reconstruction_tpu` re-exports `skyhdr`.

The project's canonical import name is the short `skyhdr`; this alias keeps
the task's full-name package convention
(hdr-map-reconstruction-from-a-single-ldr-sky-panoramic-image-for-outdoor-
illumination-estimation_tpu) importable as a Python identifier.
"""

import sys

import skyhdr
from skyhdr import *  # noqa: F401,F403
from skyhdr import config, data, models, ops, parallel, train, utils  # noqa: F401

for _name in ("config", "data", "models", "ops", "parallel", "train",
              "utils", "cli", "native"):
    try:
        _mod = __import__(f"skyhdr.{_name}", fromlist=[_name])
        sys.modules[f"{__name__}.{_name}"] = _mod
    except ImportError:
        pass
