"""Per-user contribution bounding (DP-SQLP Section 3.2).

Mirrors the reference's
``confidentialstorm/enclave/src/main/java/ch/usi/inf/confidentialstorm/enclave/dp/UserContributionLimiter.java``:
admit at most C contributions per user (keeping the L1 = C * L_m
sensitivity assumption); a ``None`` user id means event-level privacy
and is always allowed (single) / contributes nothing (bulk).

This class is the streaming/stateful form; the batch DataFrame form is
``row_number() over (partition by user_id order by ...) <= C`` (see
operators/bounding.py).
"""

from __future__ import annotations

__all__ = ["UserContributionLimiter", "clamp"]


def clamp(value: float, per_record_clamp: float) -> float:
    """Clamp a contribution to [-L_m, +L_m] (ref
    AbstractUserContributionBoundingServiceProvider.java:91-92)."""
    return max(-per_record_clamp, min(per_record_clamp, value))


class UserContributionLimiter:
    """Tracks per-user contribution counts and enforces a hard maximum."""

    def __init__(self):
        self._counts: dict = {}

    def allow(self, user_id, max_contributions: int) -> bool:
        """Admit one contribution; True iff the user is still within C.
        ``user_id is None`` => always allowed (event-level privacy)."""
        if user_id is None:
            return True
        count = self._counts.get(user_id, 0) + 1
        self._counts[user_id] = count
        return count <= max_contributions

    def allow_many(self, user_id, contributions: int, max_contributions: int) -> int:
        """Bulk admit: returns how many of ``contributions`` are
        accepted (0 for a null user, matching the reference)."""
        if user_id is None:
            return 0
        current = self._counts.get(user_id, 0)
        remaining = max_contributions - current
        if remaining <= 0:
            return 0
        accepted = min(contributions, remaining)
        self._counts[user_id] = current + accepted
        return accepted

    def user_count(self, user_id) -> int:
        if user_id is None:
            return 0
        return self._counts.get(user_id, 0)
