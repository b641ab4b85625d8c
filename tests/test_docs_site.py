"""Docs-site structure: every page mkdocs.yml navigates to must exist, and
every locale must carry the full page set (parity with the reference's
mkdocs surface: /root/reference/mkdocs.yml + docs/{en,ja,ko,pt,zh,ar})."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PAGES = ("index.md", "install.md", "inference.md", "finetune.md",
         "server.md")
LOCALES = ("en", "ja", "ko", "zh", "pt-BR", "ar")


def test_nav_targets_exist():
    nav_paths = re.findall(r":\s*([\w./-]+\.md)\s*$",
                           (REPO / "mkdocs.yml").read_text(),
                           flags=re.MULTILINE)
    assert len(nav_paths) >= len(PAGES) * len(LOCALES)
    for p in nav_paths:
        assert (REPO / "docs" / p).is_file(), f"nav target missing: {p}"


def test_all_locales_complete():
    for loc in LOCALES:
        for page in PAGES:
            f = REPO / "docs" / loc / page
            assert f.is_file(), f"missing {loc}/{page}"
            assert len(f.read_text()) > 400, f"stub page: {loc}/{page}"


def test_pages_share_commands():
    """Translations must document the same tool surface as the English
    pages (code blocks are kept verbatim)."""
    for loc in LOCALES:
        server = (REPO / "docs" / loc / "server.md").read_text()
        assert "tools/api_server.py" in server
        assert "--scheduler-slots" in server
        assert "--multihost" in server
        finetune = (REPO / "docs" / loc / "finetune.md").read_text()
        assert "tools/train.py" in finetune
        assert "tools/merge_lora.py" in finetune
        infer = (REPO / "docs" / loc / "inference.md").read_text()
        assert "stream_tts" in infer
        assert "tools/eval_quality.py" in infer
