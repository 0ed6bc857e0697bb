"""Edit-distance identities, consensus scoring, assessment cascade,
text-stats, and hashing primitives."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_ocr_ray.functions import assess
from smart_ocr_ray.functions.editdist import cer, levenshtein, nes, wer, wer_cased
from smart_ocr_ray.functions.hashing import (
    MinHasher,
    jaccard,
    minhash_jaccard,
    shingle_hashes,
    shingles,
    simhash,
    hamming64,
)
from smart_ocr_ray.functions.scoring import (
    Attempt,
    count_structure,
    pairwise_agreement,
    score_attempt_grounded,
    score_attempt_ungrounded,
    select_best,
)
from smart_ocr_ray.functions.textstats import (
    bpeish_token_count,
    content_md5,
    predict_lang,
    quality_score,
    token_count,
    winnow_fingerprint,
)


# ---------------------------------------------------------------- edit distance


def test_levenshtein_identities():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein(["a", "b"], ["a", "c", "b"]) == 1


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcd", max_size=12), st.text(alphabet="abcd", max_size=12))
def test_levenshtein_matches_reference_dp(a, b):
    def ref(x, y):
        prev = list(range(len(y) + 1))
        for i in range(1, len(x) + 1):
            curr = [i] + [0] * len(y)
            for j in range(1, len(y) + 1):
                curr[j] = min(
                    curr[j - 1] + 1, prev[j] + 1, prev[j - 1] + (x[i - 1] != y[j - 1])
                )
            prev = curr
        return prev[-1]

    assert levenshtein(a, b) == ref(a, b)


def test_wer_semantics():
    assert wer("the cat", "the cat") == 0.0
    assert wer("", "") == 0.0
    assert wer("x", "") == 1.0
    assert wer("THE CAT", "the cat") == 0.0  # lowercased (consensus.py:85-88)
    assert wer_cased("THE CAT", "the cat") == 1.0  # benchmark variant is cased
    assert wer("a b c d", "a b") == 1.0  # can exceed/hit 1.0 on insertions


def test_cer_nes():
    assert cer("abc", "abc") == 0.0
    assert cer("", "abc") == 1.0
    assert nes("abc", "abc") == 1.0
    assert nes("", "") == 1.0
    assert nes("", "abc") == 0.0
    assert 0.0 <= nes("kitten", "sitting") <= 1.0


# ---------------------------------------------------------------- scoring


def test_count_structure():
    text = "# H\n| a | b |\n- item\n1. item\nplain"
    assert count_structure(text) == 4


def test_grounded_scoring_prefers_fidelity():
    ref = "the quick brown fox jumps over the lazy dog " * 10
    good = Attempt("a", ref, True)
    bad = Attempt("b", "completely different words here entirely", True)
    assert score_attempt_grounded(good, ref) > score_attempt_grounded(bad, ref)


def test_grounded_hallucination_penalty():
    ref = "short reference text here"
    bloated = Attempt("a", "word " * 100, True)
    normal = Attempt("b", ref, True)
    assert score_attempt_grounded(normal, ref) > score_attempt_grounded(bloated, ref)


def test_ungrounded_audit_bonus():
    passed = Attempt("a", "word " * 50, True)
    failed = Attempt("b", "word " * 50, False)
    assert score_attempt_ungrounded(passed) > score_attempt_ungrounded(failed)


def test_select_best_deterministic_tie_break():
    a = Attempt("a", "same text here", True)
    b = Attempt("b", "same text here", True)
    assert select_best([a, b]) == 0


def test_pairwise_agreement():
    assert pairwise_agreement(["a b c", "a b c"]) == 1.0
    assert pairwise_agreement(["only one"]) == 1.0
    assert pairwise_agreement(["a b c", "x y z"]) == 0.0


# ---------------------------------------------------------------- assessment


def test_assess_cascade_order_and_confidence():
    ok_text = "The quarterly report shows steady growth across all economic sectors. " * 5
    is_native, conf, _ = assess.assess_text_layer(ok_text)
    assert is_native and conf >= 0.8

    short = "tiny"
    assert assess.assess_text_layer(short) == (False, 0.95, ["insufficient text layer (4 chars)"])

    few_words = "word " * 10 + "x" * 30
    is_native, conf, _ = assess.assess_text_layer(few_words[:90])
    assert not is_native

    cid = "meaningful words repeated here " * 5 + "(cid:9)"
    is_native, conf, notes = assess.assess_text_layer(cid)
    assert not is_native and conf == 0.95

    garbage_words = "a b c d e f g h i j k l " * 20
    is_native, conf, _ = assess.assess_text_layer(garbage_words)
    assert not is_native and conf == 0.70  # avg word len < 2.5


def test_columnar_detection():
    columnar = "\n".join(["token"] * 16)
    assert assess.detect_columnar_lines(columnar)
    prose = "\n".join(["many words per line here"] * 16)
    assert not assess.detect_columnar_lines(prose)


def test_estimate_columns():
    left = [100.0] * 5
    right = [400.0] * 5
    assert assess.estimate_columns(left + right, 612.0) == 2
    assert assess.estimate_columns(left, 612.0) == 1
    many = [50.0, 200.0, 350.0, 500.0, 650.0]
    assert assess.estimate_columns(many, 612.0) == 4  # capped


def test_doc_kind_sniff():
    assert assess.sniff_doc_kind(b"") == "empty"
    assert assess.sniff_doc_kind(b"%FIX-LAYOUT v1 npages=1 offsets=0\n") == "binary"
    assert assess.sniff_doc_kind(b"<html></html>") == "html"


# ---------------------------------------------------------------- textstats


def test_token_counts():
    assert token_count("a b  c") == 3
    assert token_count("") == 0
    assert token_count("  ") == 0
    assert bpeish_token_count("hello, world 42") == 4  # hello , world 42


def test_predict_lang():
    assert predict_lang("the cat and the dog in the house") == "en"
    assert predict_lang("der hund und die katze ist nicht da") == "de"
    assert predict_lang("xyz qrs") == "und"
    assert predict_lang("") == "und"


def test_quality_score_bounds():
    assert quality_score("") == 0.0
    good = "The market closed higher today, with gains across most sectors. " * 10
    assert 0.5 < quality_score(good) <= 1.0


def test_fingerprints_deterministic():
    assert content_md5("abc") == "900150983cd24fb0d6963f7d28e17f72"
    fp1 = winnow_fingerprint("the quick brown fox jumps over the lazy dog")
    fp2 = winnow_fingerprint("the quick brown fox jumps over the lazy dog")
    assert fp1 == fp2 and len(fp1) > 0


# ---------------------------------------------------------------- hashing


def test_shingles():
    assert shingles("a b c d", 3) == {"a b c", "b c d"}
    assert shingles("a", 3) == {"a"}
    assert shingles("", 3) == set()


def test_minhash_estimates_jaccard():
    hasher = MinHasher(num_perm=256)
    a = "the quick brown fox jumps over the lazy dog and runs away fast"
    b = "the quick brown fox jumps over the lazy cat and runs away fast"
    exact = jaccard(shingles(a), shingles(b))
    est = minhash_jaccard(
        hasher.signature(shingle_hashes(a)), hasher.signature(shingle_hashes(b))
    )
    assert abs(est - exact) < 0.15


def test_minhash_identical_docs():
    hasher = MinHasher(num_perm=64)
    sig = hasher.signature(shingle_hashes("identical document text here"))
    sig2 = hasher.signature(shingle_hashes("identical document text here"))
    assert np.array_equal(sig, sig2)
    assert minhash_jaccard(sig, sig2) == 1.0


def test_band_keys_collide_for_identical():
    hasher = MinHasher(num_perm=64)
    sig = hasher.signature(shingle_hashes("some document"))
    assert hasher.band_keys(sig, 16) == hasher.band_keys(sig, 16)
    assert len(hasher.band_keys(sig, 16)) == 16


def test_simhash_near_dup_small_hamming():
    a = simhash("the quick brown fox jumps over the lazy dog and keeps running ahead")
    b = simhash("the quick brown fox jumps over the lazy dog and keeps running behind")
    c = simhash("completely unrelated text about monetary policy and interest rates")
    d_ab = hamming64(np.array([a], dtype=np.uint64), b)[0]
    d_ac = hamming64(np.array([a], dtype=np.uint64), c)[0]
    assert d_ab < d_ac
