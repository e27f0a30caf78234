from .symbols import to_binance_symbol, split_symbol  # noqa: F401
from .timeframes import normalize_tf, tf_seconds, TF_SECONDS, TF_ORDER  # noqa: F401
from .timeutil import to_bar_end, to_utc, EXCHANGE_TZ  # noqa: F401
