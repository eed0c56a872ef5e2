"""Data layer: TFRecord-compatible codec, Laval extraction, host pipeline,
on-device degradation (the reference's L1 + C16, SURVEY.md §2)."""

from skyhdr.data.degradation import (  # noqa: F401
    DegradationBanks,
    degrade_batch,
    make_banks,
)
from skyhdr.data.records import (  # noqa: F401
    read_tfrecord_examples,
    write_tfrecord,
    encode_example,
    decode_example,
)
from skyhdr.data.pipeline import PanoramaDataset, prepare_sample  # noqa: F401
