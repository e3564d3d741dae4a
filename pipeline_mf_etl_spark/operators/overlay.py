"""Policy-overlay gating (SURVEY.md §2.9 B3).

The reference joins a per-key policy table onto the primary frame and
gates signals through one of five pass modes, with configurable
handling of keys absent from the overlay (reference
backtest/policy_overlay.py:135-150), then grades join coverage into an
OK/WARN/FAIL verdict (policy_overlay.py:153-208).

Spark-first shape: the pass rule is a pure boolean column expression
over the (broadcast-joined) policy class, so every mode stays inside
whole-stage codegen; the verdict is driver-side arithmetic on a
handful of collected scalars.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

OVERLAY_MODES = ("none", "allow_only", "allow_watch", "allow_or_unknown", "block_veto")
UNKNOWN_HANDLINGS = ("treat_unknown_as_fail", "treat_unknown_as_pass")

#: class value assigned to rows with no overlay match (null after left join)
UNKNOWN = "UNKNOWN"


def overlay_pass_expr(cls: Column, mode: str, unknown_handling: str = "treat_unknown_as_fail") -> Column:
    """Boolean pass column for one (mode, unknown_handling) combo.

    ``cls`` is the overlay policy class column; nulls (unmatched keys)
    are treated as ``UNKNOWN`` first, mirroring the reference's
    join-status normalization.
    """
    if mode not in OVERLAY_MODES:
        raise ValueError(f"unknown overlay mode {mode!r}")
    if unknown_handling not in UNKNOWN_HANDLINGS:
        raise ValueError(f"unknown unknown_handling {unknown_handling!r}")
    c = F.coalesce(cls, F.lit(UNKNOWN))
    allow_unknown = unknown_handling == "treat_unknown_as_pass"
    if mode == "none":
        return F.lit(True)
    if mode == "allow_only":
        return c == "ALLOW"
    if mode == "allow_watch":
        return c.isin("ALLOW", "WATCH")
    if mode == "allow_or_unknown":
        return c.isin("ALLOW", UNKNOWN) if allow_unknown else (c == "ALLOW")
    # block_veto
    if allow_unknown:
        return c != "BLOCK"
    return ~c.isin("BLOCK", UNKNOWN)


@dataclass(frozen=True)
class CoverageThresholds:
    """WARN/FAIL cutoffs for overlay join coverage (reference defaults)."""

    min_match_rate_warn: float = 0.95
    min_match_rate_fail: float = 0.80
    min_year_match_rate_warn: float = 0.90
    min_year_match_rate_fail: float = 0.70
    unknown_rate_warn: float = 0.05
    unknown_rate_fail: float = 0.20


@dataclass(frozen=True)
class CoverageVerdict:
    status: str
    reasons: tuple[str, ...] = field(default_factory=tuple)


def coverage_verdict(
    *,
    match_rate: float | None,
    unknown_rate: float | None,
    year_min_match_rate: float | None,
    duplicate_key_count_primary: int = 0,
    duplicate_key_count_overlay: int = 0,
    thresholds: CoverageThresholds = CoverageThresholds(),
) -> CoverageVerdict:
    """Grade overlay join coverage. Precedence mirrors the reference:
    duplicates → FAIL_DUPLICATES; low match → FAIL_LOW_MATCH;
    high unknown → FAIL_HIGH_UNKNOWN; then the WARN tiers; else OK."""
    t = thresholds
    reasons: list[str] = []
    if duplicate_key_count_primary > 0 or duplicate_key_count_overlay > 0:
        reasons.append(
            f"duplicate_keys primary={duplicate_key_count_primary} "
            f"overlay={duplicate_key_count_overlay}"
        )
        return CoverageVerdict("FAIL_DUPLICATES", tuple(reasons))

    if match_rate is not None and match_rate < t.min_match_rate_fail:
        reasons.append(f"match_rate_below_fail threshold={t.min_match_rate_fail:.4f} value={match_rate:.4f}")
    if year_min_match_rate is not None and year_min_match_rate < t.min_year_match_rate_fail:
        reasons.append(
            f"year_min_match_rate_below_fail threshold={t.min_year_match_rate_fail:.4f} "
            f"value={year_min_match_rate:.4f}"
        )
    if reasons:
        return CoverageVerdict("FAIL_LOW_MATCH", tuple(reasons))

    if unknown_rate is not None and unknown_rate > t.unknown_rate_fail:
        reasons.append(f"unknown_rate_above_fail threshold={t.unknown_rate_fail:.4f} value={unknown_rate:.4f}")
        return CoverageVerdict("FAIL_HIGH_UNKNOWN", tuple(reasons))

    if match_rate is not None and match_rate < t.min_match_rate_warn:
        reasons.append(f"match_rate_below_warn threshold={t.min_match_rate_warn:.4f} value={match_rate:.4f}")
    if year_min_match_rate is not None and year_min_match_rate < t.min_year_match_rate_warn:
        reasons.append(
            f"year_min_match_rate_below_warn threshold={t.min_year_match_rate_warn:.4f} "
            f"value={year_min_match_rate:.4f}"
        )
    if reasons:
        return CoverageVerdict("WARN_LOW_MATCH", tuple(reasons))

    if unknown_rate is not None and unknown_rate > t.unknown_rate_warn:
        reasons.append(f"unknown_rate_above_warn threshold={t.unknown_rate_warn:.4f} value={unknown_rate:.4f}")
        return CoverageVerdict("WARN_HIGH_UNKNOWN", tuple(reasons))

    return CoverageVerdict("OK", tuple(reasons))
