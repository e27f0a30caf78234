"""Symbol-mapping scalar functions as native Column expressions.

Semantics of ref src/datalake/utils/symbols/binance_map.py:8-24 and
src/datalake/ingestors/ibkr/contracts.py:25-38, kept JVM-side (when/split/concat
chains — no Python UDFs) so they stay inside whole-stage codegen and can be
applied to billions of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ref binance_map.py:8-11
SPECIALS = {"BTC-USD": "BTCUSDT", "ETH-USD": "ETHUSDT"}


def to_binance_symbol(sym: Column | str) -> Column:
    """'BTC-USD' -> 'BTCUSDT'; '-USD' quote becomes USDT; pass-through otherwise.

    ref src/datalake/utils/symbols/binance_map.py:14-24.
    """
    s = F.upper(F.trim(F.col(sym) if isinstance(sym, str) else sym))
    base = F.split(s, "-", 2).getItem(0)
    quote = F.split(s, "-", 2).getItem(1)
    mapped_quote = F.when(quote == "USD", F.lit("USDT")).otherwise(quote)
    dash_case = F.concat(base, mapped_quote)
    expr = F.when(s.contains("-"), dash_case).otherwise(s)
    for k, v in SPECIALS.items():
        expr = F.when(s == k, F.lit(v)).otherwise(expr)
    return expr


def split_symbol(sym: Column | str) -> Column:
    """'BTC-USD' / 'BTCUSD' / 'ETHUSDT' -> struct(base, quote).

    ref src/datalake/ingestors/ibkr/contracts.py:25-38. Unknown suffix yields
    (symbol, NULL) instead of raising (a Column cannot raise per-row).
    """
    s = F.upper(F.translate(F.col(sym) if isinstance(sym, str) else sym, ":/", "--"))
    base_dash = F.split(s, "-", 2).getItem(0)
    quote_dash = F.split(s, "-", 2).getItem(1)
    return (
        F.when(s.contains("-"),
               F.struct(base_dash.alias("base"), quote_dash.alias("quote")))
        .when(s.endswith("USDT"),
              F.struct(s.substr(F.lit(1), F.length(s) - 4).alias("base"),
                       F.lit("USDT").alias("quote")))
        .when(s.endswith("USD"),
              F.struct(s.substr(F.lit(1), F.length(s) - 3).alias("base"),
                       F.lit("USD").alias("quote")))
        .otherwise(F.struct(s.alias("base"), F.lit(None).cast("string").alias("quote")))
    )
