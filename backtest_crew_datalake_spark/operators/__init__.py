from .asof import asof_join, join_mtf  # noqa: F401
from .resample import resample_ohlcv  # noqa: F401
from .dedup import dedupe_keep  # noqa: F401
from .gaps import missing_minutes, gap_ranges, synth_fill_gaps  # noqa: F401
from .levels import build_or_levels  # noqa: F401
from .qc import (  # noqa: F401
    bars_per_day, bars_per_hour, completeness_check, monotonicity_violations,
)
from .sessionize import sessionize  # noqa: F401
from .skew import salted_join, salted_group_count  # noqa: F401
from .rangejoin import interval_join  # noqa: F401
