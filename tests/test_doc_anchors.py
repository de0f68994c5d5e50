"""Relative links in the docs tree resolve to real files.

Analog of the reference's ``scripts/check_doc_anchors.py`` gate: a renamed
page or a typo'd relative link rots silently until a reader hits a 404 —
fail it in CI instead. External URLs and intra-page ``#fragment`` anchors
are out of scope (the docs are plain markdown; fragment slugs are
renderer-specific).
"""

import re
from pathlib import Path

DOCS = Path(__file__).resolve().parent.parent / "docs"
LINK_RE = re.compile(r"\[[^\]]*\]\(([^)\s]+)\)")


def _relative_links(md: Path):
    for target in LINK_RE.findall(md.read_text(encoding="utf-8")):
        if target.startswith(("http://", "https://", "mailto:", "#")):
            continue
        yield target.split("#", 1)[0]


def test_docs_relative_links_resolve():
    assert DOCS.is_dir()
    broken = []
    for md in sorted(DOCS.rglob("*.md")):
        for target in _relative_links(md):
            if not target:
                continue
            if not (md.parent / target).exists():
                broken.append(f"{md.relative_to(DOCS)} -> {target}")
    assert not broken, "broken doc links:\n" + "\n".join(broken)


def test_docs_tree_is_nonempty():
    assert len(list(DOCS.rglob("*.md"))) > 100
