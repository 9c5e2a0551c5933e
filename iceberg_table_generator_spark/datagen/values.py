"""Seeded value-generator expressions — the reference's scalar library G1-G10.

Reference surface: `ValueGenerator.java` (single instance seeded 42,
row-at-a-time `java.util.Random`).  Per SURVEY.md §2.4 we do NOT emulate the
Java PRNG bit-for-bit; we reproduce the distribution + determinism contract
with Spark-native seeded expressions.

Determinism contract — stronger than the reference's: every "random" value
is a pure hash of (row id, seed, salt) via xxhash64, NOT a stateful RNG
stream.  `F.rand(seed)` is only deterministic per partition layout and
desynchronizes between expression instances when conditional branches skip
evaluation; a counter-free hash is reproducible for ANY partitioning, any
executor count, any re-run — the property that matters when regenerating a
100 TB table across 1000 executors.  Requires the input to carry the
`spark.range` id column (all builders here do).

All generators are pure column expressions (JVM-side, codegen'd): generating
10^12 rows is `spark.range` parallelized across the cluster with zero Python
in the hot path.

| here | reference |
|---|---|
| ids / spark.range          | G1 `id()` monotonic ids (`ValueGenerator.java:28-30`) |
| pick                       | G2 `select(List)` (`ValueGenerator.java:32-34`) |
| uniform_int                | G3 `intRange` (`ValueGenerator.java:73-76`) |
| uniform_double             | G4 `doubleRange` (`ValueGenerator.java:78-81`) |
| timestamp_in_year          | G5 `timestamp(year)` (`ValueGenerator.java:40-67`) |
| random_timestamp           | G6 `timestamp()` (`ValueGenerator.java:36-38`) |
| date_in_year               | G7 `date(year)` (`ValueGenerator.java:69-71`) |
| char_range                 | G8 `charRange` (`ValueGenerator.java:83-86`) |
| string_range               | G9 `stringRange` (`ValueGenerator.java:88-97`) |
| (rerun the plan)           | G10 `reset()` (`ValueGenerator.java:23-26`) |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

DEFAULT_SEED = 42


def ids(spark: SparkSession, n: int, num_partitions: int = 32, start: int = 0) -> DataFrame:
    """G1: gap-free monotonic id column 0..n-1 as `id`.

    `spark.range` is exact and distributed (unlike
    `monotonically_increasing_id`, which is gap-py across partitions).
    Pinned partition count keeps every seeded generator downstream
    deterministic."""
    return spark.range(start, start + n, 1, num_partitions)


_DENOM = float(1 << 40)


def _r(seed: int, salt: int, id_col: str = "id") -> Column:
    """Independent uniform [0,1) per (row id, seed, salt): a pure hash, so
    the same row always sees the same value regardless of partitioning,
    evaluation order, or how many expressions reference it."""
    h = F.xxhash64(F.col(id_col), F.lit(seed), F.lit(salt))
    return F.pmod(h, F.lit(1 << 40)).cast("double") / F.lit(_DENOM)


def uniform_int(
    lo: int, hi: int, seed: int = DEFAULT_SEED, salt: int = 0, id_col: str = "id"
) -> Column:
    """G3: uniform int in [lo, hi)."""
    if hi <= lo:
        raise ValueError(f"require hi > lo, got [{lo}, {hi})")
    return (F.floor(_r(seed, salt, id_col) * (hi - lo)) + lo).cast("int")


def uniform_double(lo: float, hi: float, seed: int = DEFAULT_SEED, salt: int = 0) -> Column:
    """G4: uniform double in [lo, hi)."""
    return _r(seed, salt) * (hi - lo) + lo


def pick(values: list, seed: int = DEFAULT_SEED, salt: int = 0) -> Column:
    """G2: uniform pick from a literal list."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.floor(_r(seed, salt) * len(values)) + 1).cast("int"))


def days_in_month(month: Column) -> Column:
    """Reference month-aware day counts with February ALWAYS 28 — the
    no-leap-year quirk of `ValueGenerator.java:53-54`, preserved."""
    return (
        F.when(month == 2, 28)
        .when(month.isin(4, 6, 9, 11), 30)
        .otherwise(31)
    )


def timestamp_in_year(year: Column | int, seed: int = DEFAULT_SEED, salt: int = 0) -> Column:
    """G5: random timestamp within `year`, preserving both reference quirks:
    February is always 28 days and hour ∈ [0, 22] (`nextInt(23)`,
    `ValueGenerator.java:64`)."""
    y = F.lit(year) if isinstance(year, int) else year
    month = (F.floor(_r(seed, salt + 1) * 12) + 1).cast("int")
    day = (F.floor(_r(seed, salt + 2) * days_in_month(month)) + 1).cast("int")
    hour = F.floor(_r(seed, salt + 3) * 23).cast("int")  # 0..22, as in the reference
    minute = F.floor(_r(seed, salt + 4) * 60).cast("int")
    second = F.floor(_r(seed, salt + 5) * 60).cast("int")
    return F.make_timestamp_ntz(y, month, day, hour, minute, second)


def random_timestamp(
    current_year: int = 2026, seed: int = DEFAULT_SEED, salt: int = 0
) -> Column:
    """G6: year uniform in [1, current_year - 10), then G5."""
    year = (F.floor(_r(seed, salt) * (current_year - 11)) + 1).cast("int")
    return timestamp_in_year(year, seed=seed, salt=salt + 10)


def date_in_year(year: Column | int, seed: int = DEFAULT_SEED, salt: int = 0) -> Column:
    """G7: `timestamp(year).toLocalDate()`."""
    return F.to_date(timestamp_in_year(year, seed=seed, salt=salt))


def char_range(lo: str, hi: str, seed: int = DEFAULT_SEED, salt: int = 0) -> Column:
    """G8: uniform char in [lo, hi)."""
    lo_c, hi_c = ord(lo), ord(hi)
    if hi_c <= lo_c:
        raise ValueError(f"require hi > lo, got [{lo!r}, {hi!r})")
    return F.chr(F.floor(_r(seed, salt) * (hi_c - lo_c)) + lo_c)


def string_range(
    lo: str, hi: str, length: int, seed: int = DEFAULT_SEED, salt: int = 0
) -> Column:
    """G9: per-position uniform char between bound strings, padded with
    'a'..'z' beyond the bounds' length (`ValueGenerator.java:88-97`)."""
    chars = []
    for i in range(length):
        lo_c = lo[i] if i < len(lo) else "a"
        hi_c = hi[i] if i < len(hi) else "z"
        if ord(hi_c) <= ord(lo_c):
            chars.append(F.lit(lo_c))
        else:
            chars.append(char_range(lo_c, hi_c, seed=seed, salt=salt * 1000 + i))
    return F.concat(*chars)
