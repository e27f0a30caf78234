"""Scalar-function queries (SURVEY §2.7/§2.8): symbol mapping and timeframe
normalization exercised over inline VALUES — the oracle reimplements the same
public mapping rules in SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from ..functions.symbols import split_symbol, to_binance_symbol
from ..functions.timeframes import normalize_tf_col

_SYMS = ["BTC-USD", "ETH-USD", "SOL-USD", "ADA-EUR", "BTCUSDT",
         "DOGE-USDT", "BTC/USD", "ETHUSD", "XYZ"]
_TFS = ["1 min", "5 mins", "15 mins", "30 mins", "1hour", "60min",
        "1day", "m5", "H4"]


@register(
    "q_symbol_map",
    oracle="""
    WITH t(s) AS (VALUES ('BTC-USD'), ('ETH-USD'), ('SOL-USD'), ('ADA-EUR'),
                         ('BTCUSDT'), ('DOGE-USDT'), ('BTC/USD'), ('ETHUSD'),
                         ('XYZ')),
    n AS (SELECT s, REPLACE(REPLACE(UPPER(TRIM(s)), ':', '-'), '/', '-') AS c
          FROM t)
    SELECT s AS symbol,
           CASE WHEN UPPER(TRIM(s)) = 'BTC-USD' THEN 'BTCUSDT'
                WHEN UPPER(TRIM(s)) = 'ETH-USD' THEN 'ETHUSDT'
                WHEN CONTAINS(UPPER(TRIM(s)), '-') THEN
                     SPLIT_PART(UPPER(TRIM(s)), '-', 1)
                     || CASE WHEN SPLIT_PART(UPPER(TRIM(s)), '-', 2) = 'USD'
                             THEN 'USDT'
                             ELSE SPLIT_PART(UPPER(TRIM(s)), '-', 2) END
                ELSE UPPER(TRIM(s)) END AS binance_symbol,
           CASE WHEN CONTAINS(c, '-') THEN SPLIT_PART(c, '-', 1)
                WHEN c LIKE '%USDT' THEN SUBSTR(c, 1, LENGTH(c) - 4)
                WHEN c LIKE '%USD' THEN SUBSTR(c, 1, LENGTH(c) - 3)
                ELSE c END AS base,
           CASE WHEN CONTAINS(c, '-') THEN SPLIT_PART(c, '-', 2)
                WHEN c LIKE '%USDT' THEN 'USDT'
                WHEN c LIKE '%USD' THEN 'USD'
                ELSE NULL END AS quote
    FROM n
    """,
)
def q_symbol_map(spark, sf_dir):
    """F1/F2: Binance symbol mapping + base/quote splitting
    (ref binance_map.py:14-24, contracts.py:25-38)."""
    df = spark.createDataFrame([(s,) for s in _SYMS], ["symbol"])
    parts = split_symbol("symbol")
    return df.select(
        "symbol",
        to_binance_symbol("symbol").alias("binance_symbol"),
        parts.getField("base").alias("base"),
        parts.getField("quote").alias("quote"),
    )


@register(
    "q_tf_normalize",
    oracle="""
    WITH t(tf) AS (VALUES ('1 min'), ('5 mins'), ('15 mins'), ('30 mins'),
                          ('1hour'), ('60min'), ('1day'), ('m5'), ('H4')),
    k AS (SELECT tf, REPLACE(LOWER(TRIM(tf)), ' ', '') AS key FROM t)
    SELECT tf,
           CASE key WHEN '1min' THEN 'M1' WHEN 'm1' THEN 'M1'
                    WHEN '5mins' THEN 'M5' WHEN '5min' THEN 'M5'
                    WHEN 'm5' THEN 'M5'
                    WHEN '15mins' THEN 'M15' WHEN '15min' THEN 'M15'
                    WHEN 'm15' THEN 'M15'
                    WHEN '30mins' THEN 'M30' WHEN '30min' THEN 'M30'
                    WHEN 'm30' THEN 'M30'
                    WHEN '1hour' THEN 'H1' WHEN '60min' THEN 'H1'
                    WHEN 'h1' THEN 'H1'
                    WHEN '1day' THEN 'D1' WHEN 'd1' THEN 'D1'
                    ELSE UPPER(tf) END AS tf_norm
    FROM k
    """,
)
def q_tf_normalize(spark, sf_dir):
    """F3: timeframe-token normalization (ref provider.py:12-23)."""
    df = spark.createDataFrame([(t,) for t in _TFS], ["tf"])
    return df.select("tf", normalize_tf_col(F.col("tf")).alias("tf_norm"))
