from .lake import read_range, read_day, LAYOUT_PARTITIONS  # noqa: F401
from .writer import upsert_candles, write_levels  # noqa: F401
from .synth import make_m1  # noqa: F401
