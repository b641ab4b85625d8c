"""i18n scan tool: extraction + locale sync (ref i18n/scan.py behavior)."""

import json
from pathlib import Path

from fish_speech_tpu.i18n.scan import extract_i18n_strings, scan_roots, sync_locales
import ast


def test_extract_and_sync(tmp_path):
    src = tmp_path / "code"
    src.mkdir()
    (src / "a.py").write_text(
        'def f():\n    x = i18n("Hello")\n    y = i18n("World")\n'
        '    z = other("nope")\n')
    (src / "b.py").write_text('v = i18n("Hello")\n')

    strings = scan_roots([src])
    assert sorted(set(strings)) == ["Hello", "World"]

    loc = tmp_path / "locale"
    loc.mkdir()
    (loc / "en_US.json").write_text(json.dumps({"Hello": "Hello",
                                                "Stale": "Stale"}))
    (loc / "ja_JP.json").write_text(json.dumps({"Hello": "こんにちは"}))

    missing = sync_locales(strings, check_only=False, locale_dir=loc)
    assert missing == 2  # "World" was missing from en_US and ja_JP
    updated = json.loads((loc / "en_US.json").read_text())
    assert set(updated) == {"Hello", "World"}  # stale dropped, missing added
    assert updated["World"] == "World"  # identity default


def test_repo_locales_consistent():
    """The shipped locales must cover every i18n() call in the repo."""
    from fish_speech_tpu.i18n.scan import main

    assert main(["--check"]) == 0
