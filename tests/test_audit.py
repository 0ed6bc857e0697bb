"""Audit heuristics + failure-mode classification thresholds (M12–M13,
mirrors /root/reference/tests/test_audit_heuristics.py patterns)."""

from smart_ocr_ray.functions import audit as au


def _words(n, word="economic"):
    return " ".join(f"{word}{i % 7}" for i in range(n))


def test_empty_output():
    r = au.audit("")
    assert not r.passed and r.primary_failure == au.EMPTY_OUTPUT
    r = au.audit("   \n  ")
    assert r.primary_failure == au.EMPTY_OUTPUT


def test_refusal_early_exit():
    r = au.audit("I am sorry, I cannot read this document.")
    assert not r.passed
    assert r.failure_modes == [au.REFUSAL]


def test_refusal_buried_in_long_text_ignored():
    # >=200 words, phrase beyond the first 500 chars → legitimate text.
    text = _words(260) + " and then he said I am sorry about the markets."
    r = au.audit(text)
    assert r.passed


def test_cid_artifacts_fail_as_garbage():
    r = au.audit(_words(80) + " (cid:42)")
    assert not r.passed and au.GARBAGE in r.failure_modes


def test_word_count_threshold():
    assert not au.audit(_words(49)).passed
    assert au.audit(_words(50)).passed
    assert au.audit(_words(49)).primary_failure == au.LOW_WORD_COUNT


def test_truncation_check():
    # >5 expected units with <100 words/unit → truncated.
    r = au.audit(_words(300), expected_units=6)
    assert not r.passed and au.TRUNCATED in r.failure_modes
    assert au.audit(_words(700), expected_units=6).passed


def test_truncation_beats_low_word_count_priority():
    r = au.audit(_words(40), expected_units=10)
    assert r.primary_failure == au.TRUNCATED


def test_hallucination_loop():
    sentence = "The model repeats this exact sentence again. "
    filler = "Other sentences go here to pad. More filler text now. Third filler sentence. "
    r = au.audit(filler + sentence * 3 + "Done now.")
    assert not r.passed and au.HALLUCINATION in r.failure_modes
    assert r.primary_failure == au.HALLUCINATION


def test_formatting_hallucination_needs_two_patterns():
    one = _words(60) + " Use a standard font."
    assert au.audit(one).passed
    two = _words(60) + " Use a standard font. Times New Roman preferred."
    r = au.audit(two)
    assert not r.passed and au.HALLUCINATION in r.failure_modes


def test_garbage_ratio_with_math_exemption():
    garbage = _words(60) + " " + "¤" * 200
    r = au.audit(garbage)
    assert not r.passed and au.GARBAGE in r.failure_modes
    # Math-dense text is exempt.
    math_text = ("x " * 60) + "\\frac{a}{b}$$ {x_i^2} " * 60
    assert au.is_math_dense(math_text)


def test_priority_ordering():
    assert au._PRIORITY[au.HALLUCINATION] > au._PRIORITY[au.REFUSAL]
    assert au._PRIORITY[au.REFUSAL] > au._PRIORITY[au.EMPTY_OUTPUT]
    assert au._PRIORITY[au.EMPTY_OUTPUT] > au._PRIORITY[au.TRUNCATED]
    assert au._PRIORITY[au.TRUNCATED] > au._PRIORITY[au.GARBAGE]
    assert au._PRIORITY[au.GARBAGE] > au._PRIORITY[au.LOW_WORD_COUNT]


def test_confidence_estimation():
    # Two errors → 0.95 (scorer.py:143-151 semantics).
    r = au.audit("(cid:1) short")
    assert r.confidence in (0.95, 0.85, 0.75)
    assert not r.passed


def test_warnings_do_not_fail():
    r = au.audit(_words(60) + " aaaaa bbbbb")  # repeated chars → warning only
    assert r.passed
    # Warning scans are skipped on the passing fast path (they feed only
    # the confidence of failed diagnoses); the detectors stay testable:
    assert au.repeated_patterns("aaaaa") == ["repeated_chars"]
    # On a failing doc the warnings are populated.
    r2 = au.audit("aaaaa bbbbb short")
    assert not r2.passed and "repeated_patterns" in r2.warnings


def test_structure_detection():
    assert au.has_structure("# Header\n\nbody")
    assert au.has_structure("1. item\n2. item")
    assert au.has_structure("- a\n- b")
    assert not au.has_structure("plain single paragraph")
