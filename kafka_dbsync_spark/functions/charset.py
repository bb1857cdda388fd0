"""Legacy charset recovery (BIG5/GBK/… stored raw in US7ASCII databases).

Behavioral parity with the reference's LegacyCharsetTransform
(LegacyCharsetTransform.java:220-250 `decodeToUnicode`): when an Oracle
database declares US7ASCII but applications wrote multibyte-encoded bytes,
the CDC pipeline surfaces each raw byte ≥ 0x80 as the Unicode codepoint
U+FF00+byte (halfwidth/fullwidth-forms area). Recovery is:

    for each char: codepoint in [0xFF00, 0xFFFF] → byte (cp - 0xFF00)
                   codepoint < 0x80              → byte as-is (ASCII)
                   anything else                 → string already clean; pass through
    then bytes.decode(target_charset)

Deterministic and byte-exact, validated against the reference's BIG5 test
vectors (big5-tests.sh:216-293) in tests/test_functions.py.

This is the one operator in the engine that genuinely needs Python — it is
a vectorized Arrow-batched pandas UDF, not a row-at-a-time UDF, so the hot
path stays off the Python-per-row serde.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _recover_one(s: str | None, charset: str) -> str | None:
    if s is None:
        return None
    out = bytearray()
    dirty = False
    for ch in s:
        cp = ord(ch)
        if 0xFF00 <= cp <= 0xFFFF:
            out.append(cp - 0xFF00)
            dirty = True
        elif cp < 0x80:
            out.append(cp)
        else:
            # already-clean multibyte text: not a garbled column, pass through
            # (no-op short-circuit, LegacyCharsetTransform.java:175-177)
            return s
    if not dirty:
        return s
    try:
        return out.decode(charset)
    except (UnicodeDecodeError, LookupError):
        # undecodable ⇒ leave input untouched (reference logs + passes through)
        return s


def recover_legacy_charset(c: Column | str, charset: str = "big5") -> Column:
    """Column expression: recover garbled halfwidth text via ``charset``."""

    @F.pandas_udf(T.StringType())
    def _recover(series: pd.Series) -> pd.Series:
        return series.map(lambda s: _recover_one(s, charset))

    col = F.col(c) if isinstance(c, str) else c
    return _recover(col)
