"""LaTeX reconciliation semantics (F8, reconciler.py parity)."""

from smart_ocr_ray.functions.reconcile import (
    extract_latex_blocks,
    find_insertion_point,
    latex_blocks_match,
    merge_latex,
    normalize_latex,
    reconcile_attempts,
)


def test_extract_blocks_all_kinds():
    text = (
        "Inline $x^2$ here. Display: $$\\frac{a}{b} = c$$ and an env "
        "\\begin{equation}E = mc^2\\end{equation} done."
    )
    blocks = extract_latex_blocks(text)
    kinds = [(b.is_display, b.content[:2]) for b in blocks]
    assert len(blocks) == 3
    assert sum(b.is_display for b in blocks) == 2
    assert blocks == sorted(blocks, key=lambda b: b.start)


def test_normalize_latex():
    # \  and \, become plain spaces after whitespace collapse
    # (replacements applied last, reconciler.py:185-192).
    assert normalize_latex("  \\frac{a}{b}\\ = c  ") == "\\frac{a}{b} = c"
    assert normalize_latex("x\n  +\ty") == "x + y"


def test_blocks_match_containment_and_jaccard():
    a = extract_latex_blocks("$$\\frac{a}{b} = c$$")[0]
    b = extract_latex_blocks("$$ \\frac{a}{b}=c $$")[0]
    # token-Jaccard over \frac, a, b, c is high
    assert latex_blocks_match(a, b)
    c = extract_latex_blocks("$$\\sum_i z_i$$")[0]
    assert not latex_blocks_match(a, c)
    inline = extract_latex_blocks("$\\frac{a}{b} = c$")[0]
    assert not latex_blocks_match(a, inline)  # display mode differs


def test_merge_replaces_matching_blocks():
    # Source block matches by normalized containment (whitespace-only
    # difference) and replaces the base's worse-formatted copy.
    base = "The ratio is $$\\frac{a}{b}=c$$ as shown."
    source = "Junk text $$\\frac{a}{b} = c \\cdot d$$ more junk."
    merged, n = merge_latex(base, source)
    assert n == 1
    assert "$$\\frac{a}{b} = c \\cdot d$$" in merged
    assert merged.startswith("The ratio is")


def test_merge_inserts_at_reference_phrase():
    base = "The solution is given by: and then we continue.\n\nNext para."
    source = "$$x = \\frac{-b}{2a}$$"
    merged, n = merge_latex(base, source)
    assert n == 1
    idx = merged.index("given by:")
    assert merged.index("$$x") > idx


def test_merge_inserts_at_paragraph_break_fallback():
    base = "First paragraph only.\n\nSecond paragraph."
    merged, n = merge_latex(base, "$$y = z$$")
    assert n == 1
    assert merged.index("$$y = z$$") > merged.index("First paragraph only.")


def test_no_source_latex_is_noop():
    assert merge_latex("plain text", "also plain") == ("plain text", 0)


def test_find_insertion_point_priorities():
    assert find_insertion_point("see equation (3) here") == len("see equation (3)")
    assert find_insertion_point("no refs\n\nbut paras") == len("no refs")
    assert find_insertion_point("nothing at all") == -1


def test_reconcile_attempts_record():
    result = reconcile_attempts(
        "Text defined as: end.", "$$a+b$$", primary_name="dom", latex_name="layout"
    )
    assert result["primary"] == "dom"
    assert result["latex_source"] == "layout"
    assert result["conflicts_resolved"] == 1
    assert "$$a+b$$" in result["text"]
