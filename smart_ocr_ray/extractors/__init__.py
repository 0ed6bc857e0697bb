"""Extractor registry — the user-extension surface (SURVEY.md §2.12).

An extractor is a callable ``(html: bytes, text_layer: str) ->
list[UnitResult]`` (see ``base.py``). Registration mirrors the
reference's engine registry (``/root/reference/src/socr/engines/
registry.py:16-23``): a plain dict keyed by extractor name; routing and
repair chains reference extractors by name.
"""

from .base import UnitResult, Block
from .native import extract_native
from .html_extract import extract_html
from .layout import extract_layout
from .rawtext import extract_rawtext

# Name → extractor. Order matters nowhere; repair routing picks by the
# family tables in stages/repair_routing.py.
EXTRACTORS = {
    "native": extract_native,
    "dom": extract_html,
    "layout": extract_layout,
    "rawtext": extract_rawtext,
}

__all__ = ["EXTRACTORS", "UnitResult", "Block", "extract_native", "extract_html",
           "extract_layout", "extract_rawtext"]
