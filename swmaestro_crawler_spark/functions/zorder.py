"""Z-order (Morton) curve expressions for multi-column file clustering.

The catalog's ``cluster_by`` compaction sorts on ONE column, so manifest
min/max pruning is tight on that column and useless on every other.  A
100-TB spans table is scanned both by host (politeness replays, per-host
audits) and by time (recency-horizon frontier scans) — a single sort
order can't serve both.  Z-ordering interleaves the bits of two
normalized 16-bit keys into one 32-bit sort key, so each output file
owns a small rectangle in (x, y) space and min/max stats prune on
EITHER column (the same layout trick as Delta/Iceberg ``ZORDER BY``).

Everything here is integer bit math written with ``<<``/``|``/``&``,
which parse and evaluate identically in Spark SQL and DuckDB — the
oracle shares the literal expression text, so the contract query is
value-exact.  (``^`` is avoided: DuckDB reads it as power.)  The only
engine-specific piece is integer division in the 16-bit normalization
(Spark ``div`` vs DuckDB ``//``).

Overflow bound: normalization computes ``(x - mn) * 65535`` in int64,
so the column range must stay below 2^47 (~1.4e14 — four years of
microseconds).  Larger ranges should pre-shift; the catalog raises
rather than wrap silently.
"""

from __future__ import annotations

MAX_NORM_RANGE = (1 << 47) - 1

# classic 16 -> 32 bit spread: insert a zero between consecutive bits
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16_sql(e: str) -> str:
    """SQL expression spreading the low 16 bits of ``e`` to even bit
    positions (engine-shared syntax)."""
    e = f"(({e}) & 65535)"
    for sh, mask in _SPREAD_STEPS:
        e = f"((({e}) | (({e}) << {sh})) & {mask})"
    return e


def zvalue_sql(x16: str, y16: str) -> str:
    """Interleave two 16-bit expressions into a 32-bit Morton key
    (x gets the even bits, y the odd)."""
    return f"({spread16_sql(x16)} | ({spread16_sql(y16)} << 1))"


def norm16_sql(col: str, mn: int, mx: int, *, engine: str) -> str:
    """Scale an integer column with known [mn, mx] bounds onto [0, 65535]
    by exact integer division (``div`` in Spark, ``//`` in DuckDB)."""
    rng = max(int(mx) - int(mn), 1)
    if rng > MAX_NORM_RANGE:
        raise ValueError(
            f"z-order range {rng} exceeds the int64-safe bound {MAX_NORM_RANGE}"
        )
    op = {"spark": "div", "duckdb": "//"}[engine]
    return f"(((({col}) - ({int(mn)})) * 65535) {op} {rng})"


def zvalue_norm_sql(
    xcol: str,
    ycol: str,
    xbounds: tuple[int, int],
    ybounds: tuple[int, int],
    *,
    engine: str,
) -> str:
    return zvalue_sql(
        norm16_sql(xcol, *xbounds, engine=engine),
        norm16_sql(ycol, *ybounds, engine=engine),
    )
