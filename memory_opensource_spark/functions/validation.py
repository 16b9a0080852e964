"""User-id validation heuristics (services/auth_utils.py:42-200).

The reference guards every request against a common developer error: putting an
EXTERNAL identifier (UUID, email, ``user_``/``cus_``-prefixed, hyphenated) in
the ``user_id`` field that is reserved for internal Parse ObjectIds (exactly 10
alphanumeric chars).  ``looks_like_external_id`` is the heuristic
(auth_utils.py:59-118); ``validate_user_identification`` wraps it in a
structured 400-style error (auth_utils.py:119-200).

Two forms, same truth table (parity-tested bit-for-bit):

- ``looks_like_external_id_py`` — the request-facade twin, one id at a time;
- ``looks_like_external_id`` — a Column expression, so a whole ingest batch
  (or a 100 TB events table) validates in one codegen'd scan pass with no
  Python in the loop.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

# auth_utils.py:52-57
UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
EMAIL_RE = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"
EXTERNAL_PREFIXES = ("user_", "ext_", "external_", "usr_", "u_", "customer_",
                     "cust_", "cus_", "client_", "acct_", "sub_", "org_")

_UUID_PATTERN = re.compile(UUID_RE)
_EMAIL_PATTERN = re.compile(EMAIL_RE)
_PREFIX_RE = "^(" + "|".join(EXTERNAL_PREFIXES) + ")"
_ALNUM_RE = r"^[a-zA-Z0-9]+$"


def looks_like_external_id_py(user_id: Any) -> bool:
    """auth_utils.py:59-118, verbatim truth table."""
    if not user_id or not isinstance(user_id, str):
        return False
    if _UUID_PATTERN.match(user_id) or _EMAIL_PATTERN.match(user_id):
        return True
    if user_id.lower().startswith(EXTERNAL_PREFIXES):
        return True
    if "-" in user_id and len(user_id) > 10:
        return True
    if len(user_id) > 20 and not user_id.isalnum():
        return True
    return False


def looks_like_external_id(c: Column) -> Column:
    """Column form of the same heuristic.  The last two branches of the Python
    original (`len==10 and isalnum` / fallthrough) both return False, so the
    function reduces to an OR of the five positive tests — one codegen pass."""
    return F.when(c.isNull() | (c == ""), F.lit(False)).otherwise(
        c.rlike(UUID_RE)
        | c.rlike(EMAIL_RE)
        | F.lower(c).rlike(_PREFIX_RE)
        | (c.contains("-") & (F.length(c) > 10))
        | ((F.length(c) > 20) & ~c.rlike(_ALNUM_RE))
    )


@dataclass
class UserIdValidationError:
    """auth_utils.py:119-141."""

    code: int
    error: str
    field: str
    provided_value: str
    reason: str
    suggestion: str

    def to_dict(self) -> dict:
        return {
            "code": self.code,
            "error": self.error,
            "details": {
                "field": self.field,
                "provided_value": self.provided_value,
                "reason": self.reason,
                "suggestion": self.suggestion,
            },
        }


def validate_user_identification(user_id: str | None,
                                 metadata_user_id: str | None = None
                                 ) -> UserIdValidationError | None:
    """auth_utils.py:144-190 minus the Parse-server round-trip: flag ids that
    look external; request user_id takes precedence over metadata user_id;
    absent ids pass."""
    uid = user_id or metadata_user_id
    if not uid:
        return None
    if looks_like_external_id_py(uid):
        return UserIdValidationError(
            code=400,
            error="Invalid user_id format",
            field="user_id",
            provided_value=uid[:50] + ("..." if len(uid) > 50 else ""),
            reason="This looks like an external user identifier (UUID, email, or "
                   "custom format). Did you mean to use 'external_user_id' instead?",
            suggestion="Use 'external_user_id' for your application's user "
                       "identifiers. 'user_id' is reserved for internal user IDs "
                       "(10 alphanumeric characters).",
        )
    return None
