"""User-id validation parity tests (mirrors tests/test_user_id_validation.py;
implementation services/auth_utils.py:42-200)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.functions.validation import (
    looks_like_external_id,
    looks_like_external_id_py,
    validate_user_identification,
)

EXTERNAL = [
    "550e8400-e29b-41d4-a716-446655440000",          # uuid v4
    "550E8400-E29B-41D4-A716-446655440000",          # uuid uppercase
    "alice@example.com",                             # email
    "alice+tag@sub.example.co",                      # email with plus/subdomain
    "user_12345",                                    # user_ prefix
    "ext_abc", "external_abc", "USER_X",             # prefixes, case-insensitive
    "customer_9", "cust_9", "cus_NffrFeUfNV2Hib",    # stripe-style
    "client_1", "acct_1", "sub_1", "org_1",
    "company-user-12345",                            # long hyphenated
    "proj-alpha-team-lead",
    "abcdefghij_1234567890_xyz",                     # long non-alnum
    "auth0|507f1f77bcf86cd799439011",                # pipe -> long non-alnum
]

INTERNAL = [
    "mkcNHhG5KP", "abcdefghij", "1234567890", "ABC123xyz0", "AbCdEfGhIj",
    "abc-def-gh",                                    # 10 chars hyphenated: under threshold
    "abcdefghij1234567890",                          # 20-char alnum: ambiguous, allowed
    "aB1cD2eF3gH4iJ5kL6mN7oP8qR9s",                  # firebase uid, 28-char alnum
    "alice", "u1",
    "",
]


@pytest.mark.parametrize("uid", EXTERNAL)
def test_external_ids_detected_py(uid):
    assert looks_like_external_id_py(uid) is True


@pytest.mark.parametrize("uid", INTERNAL)
def test_internal_ids_pass_py(uid):
    assert looks_like_external_id_py(uid) is False


def test_none_and_non_string():
    assert looks_like_external_id_py(None) is False
    assert looks_like_external_id_py(12345) is False
    assert looks_like_external_id_py(["user_123"]) is False


def test_column_form_parity(spark):
    """The Column expression must agree with the Python twin on every case."""
    cases = EXTERNAL + INTERNAL
    df = spark.createDataFrame([(c,) for c in cases], "candidate string")
    got = {r.candidate: r.ext for r in
           df.withColumn("ext", looks_like_external_id(F.col("candidate"))).collect()}
    for c in cases:
        assert got[c] == looks_like_external_id_py(c), c


def test_validate_no_user_id_passes():
    assert validate_user_identification(None) is None
    assert validate_user_identification(None, None) is None


def test_validate_uuid_fails_with_structured_error():
    err = validate_user_identification("550e8400-e29b-41d4-a716-446655440000")
    assert err is not None and err.code == 400 and err.field == "user_id"
    d = err.to_dict()
    assert d["details"]["field"] == "user_id"
    assert "external_user_id" in d["details"]["suggestion"]


def test_validate_metadata_user_id_checked_and_precedence():
    assert validate_user_identification(None, "user_abc") is not None
    # request user_id takes precedence: valid request id passes even if
    # metadata id is external (auth_utils.py:169-171 uses the first non-None)
    assert validate_user_identification("mkcNHhG5KP", "user_abc") is None


def test_validate_long_value_truncated_in_error():
    err = validate_user_identification("user_" + "x" * 100)
    assert err.provided_value.endswith("...") and len(err.provided_value) == 53


def test_engine_rejects_external_user_id(spark):
    from memory_opensource_spark.api import MemoryEngine

    eng = MemoryEngine(spark, dim=32)
    with pytest.raises(ValueError, match="Invalid user_id format"):
        eng.add_memory(memory_id="m1", content="hello", user_id="alice@example.com")
    # valid ids still ingest
    eng.add_memory(memory_id="m2", content="hello again", user_id="alice")
    assert eng.memories.count() == 1
