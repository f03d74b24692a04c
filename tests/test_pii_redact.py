"""PII scrub: the redaction must actually fire (placeholders present,
counts positive) and leave no PII-shaped text behind."""

from __future__ import annotations

import re

SF_DIR = "/root/testdata/sf0.001"


def test_pii_redact_fires_and_is_clean(spark):
    from swmaestro_crawler_spark.operators.curation import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        q_pii_redact,
    )

    rows = q_pii_redact(spark, SF_DIR).collect()
    assert rows
    email = re.compile(PII_EMAIL)
    ipv4 = re.compile(PII_IPV4)
    phone = re.compile(PII_PHONE)
    for r in rows:
        assert r.n_email >= 1 and r.n_ip >= 1 and r.n_phone >= 1
        assert "<EMAIL>" in r.clean and "<IP>" in r.clean and "<PHONE>" in r.clean
        assert not email.search(r.clean)
        assert not ipv4.search(r.clean)
        assert not phone.search(r.clean)
