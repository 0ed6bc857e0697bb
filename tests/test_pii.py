"""PII scrub (ops/pii.py): pattern semantics, scrub order, seeding
arithmetic — the match paths the word-soup gate corpus only reaches via
the deterministic seeding."""

import pyarrow as pa

from smart_ocr_ray.ops.pii import scrub_batch, seed_pii


def _scrub_one(text: str):
    scrubbed, counts = scrub_batch(pa.array([text], pa.string()))
    return scrubbed.to_pylist()[0], {k: v.to_pylist()[0] for k, v in counts.items()}


def test_no_match_text_unchanged():
    text = "plain prose with no contact details at all"
    out, counts = _scrub_one(text)
    assert out == text
    assert counts == {"n_emails": 0, "n_phones": 0, "n_ips": 0}


def test_email_scrub_and_count():
    out, counts = _scrub_one("write a.b+c_d%e@sub.example.co or x@y.org today")
    assert out == "write <EMAIL> or <EMAIL> today"
    assert counts["n_emails"] == 2


def test_phone_requires_word_boundaries():
    out, counts = _scrub_one("call 555-123-4567 not x555-123-45678")
    assert counts["n_phones"] == 1
    assert "<PHONE>" in out
    # The digit-glued variant is not a phone (boundary fails on the 5th
    # trailing digit).
    assert "x555-123-45678" in out


def test_ipv4_scrub():
    out, counts = _scrub_one("from 10.0.255.3 and 192.168.1.1, not 1.2.3")
    assert counts["n_ips"] == 2
    assert out == "from <IP> and <IP>, not 1.2.3"


def test_mixed_all_three():
    out, counts = _scrub_one("a@b.io 555-000-0000 0.0.0.0")
    # 555-000-0000: middle group 000 is fine for the regex.
    assert counts == {"n_emails": 1, "n_phones": 1, "n_ips": 1}
    assert out == "<EMAIL> <PHONE> <IP>"


def test_counts_taken_before_replacement():
    # An email whose local part looks phone-ish must not double-count:
    # counts come from the ORIGINAL text, one pass per pattern.
    out, counts = _scrub_one("send to 555-123-4567@example.com please")
    # The email regex consumes the whole token (local part allows digits
    # and dashes? dashes are NOT in the local-part class, so this is
    # phone + partial email).
    assert counts["n_phones"] == 1
    assert out.count("<PHONE>") <= 1


def test_seed_pii_round_robin_arithmetic():
    ids = [0, 1, 2, 300, 901, 7000]
    seeded = seed_pii(ids, pa.array(["base"] * len(ids), pa.string())).to_pylist()
    assert seeded[0] == "base contact user0@example.com now"
    assert seeded[1] == "base call 555-101-1001 today"
    assert seeded[2] == "base from 192.168.2.14 logged"
    # Phone groups stay 3 and 4 digits at the range edges.
    assert seeded[3].endswith("@example.com now")  # 300 % 3 == 0
    assert " call 555-" in seeded[4]
    mid = seeded[4].split("555-")[1].split(" ")[0]
    g1, g2 = mid.split("-")
    assert len(g1) == 3 and len(g2) == 4
    # 7000 % 3 == 1 -> phone; octets for id % 3 == 2 stay < 256 always.
    assert seeded[5].startswith("base call 555-")


def test_seeded_scrub_fully_redacts():
    ids = list(range(30))
    seeded = seed_pii(ids, pa.array([""] * 30, pa.string()))
    scrubbed, counts = scrub_batch(seeded)
    total = (
        sum(counts["n_emails"].to_pylist())
        + sum(counts["n_phones"].to_pylist())
        + sum(counts["n_ips"].to_pylist())
    )
    assert total == 30  # exactly one seeded PII token per doc
    for t in scrubbed.to_pylist():
        assert "@" not in t and "192.168" not in t
