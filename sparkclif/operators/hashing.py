"""Engine-portable hashing — the single source of the md5-bits basis.

Contract (pinned to hashlib in tests/test_sampling.py, reproduced
bit-for-bit by the DuckDB oracles in queries/group_i.py):

    md5 hex digest = 32 lowercase hex chars, big-endian byte order.
    hex chars [17, 32] are the LOW 8 bytes; [25, 32] the low 4 bytes.
    DuckDB:  ('0x' || substr(md5(x), START, LEN))::UBIGINT
    Spark:   conv(substring(md5(x), START, LEN), 16, 10)::long

Parse at most 15 hex chars per call JVM-side (16 could exceed signed
BIGINT); consumers needing 64 bits take two 8-char halves and
recombine (see dedup.simhash64). Any change to this basis must update
the group_i oracle snippets and the hashlib pin tests together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bits(col: Column, hex_start: int, hex_len: int) -> Column:
    """Unsigned value of md5(col)'s hex chars [hex_start, hex_start +
    hex_len) as a LONG (1-based start, per substring/substr in both
    engines). hex_len must be <= 15 to stay within signed BIGINT."""
    if hex_len > 15:
        raise ValueError("hex_len > 15 overflows signed BIGINT; take two halves")
    return F.conv(F.substring(F.md5(col), hex_start, hex_len), 16, 10).cast("long")
