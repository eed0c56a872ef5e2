"""Host-side utilities (the reference's utils.py layer)."""

from skyhdr.utils.io import (  # noqa: F401
    get_exposure_lists,
    load_dorf_curves,
    inverse_rf,
    read_hdr,
    write_hdr,
)
from skyhdr.utils.dirs import create_new_dir, timestamp  # noqa: F401
