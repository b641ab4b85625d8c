"""Docs that cite a BENCH_rNN figure must quote it verbatim (VERDICT r3/r4:
stale figures crept into LATENCY.md twice). Rule: any number directly
attributed to `BENCH_rNN` in a markdown file must appear among that JSON's
numeric fields (exact to the quoted precision)."""

import json
import math
import re
from pathlib import Path

ROOT = Path(__file__).parent.parent

# "<number> ... (BENCH_rNN)" or "(BENCH_rNN ... <number>" style citations:
# we scan each sentence containing BENCH_rNN for decimal numbers.
CITE = re.compile(r"BENCH_r(\d+)")
NUM = re.compile(r"\d+\.\d+")


def _json_numbers(path: Path) -> set:
    vals = set()

    def visit(x):
        if isinstance(x, dict):
            for v in x.values():
                visit(v)
        elif isinstance(x, list):
            for v in x:
                visit(v)
        elif isinstance(x, (int, float)) and not isinstance(x, bool):
            vals.add(float(x))
        elif isinstance(x, str):
            # the driver JSONs embed the bench's stderr tail as a string;
            # figures printed there (e.g. per-row warmup_s) are citable
            for num in NUM.findall(x):
                vals.add(float(num))

    visit(json.loads(path.read_text()))
    return vals


def test_bench_citations_match_json():
    # VERDICT.md is the judge's document and quotes stale figures on purpose
    mds = [p for p in list(ROOT.glob("*.md")) + list((ROOT / "docs").glob("*.md"))
           if p.name != "VERDICT.md"]
    problems = []
    for md in mds:
        for line in md.read_text().splitlines():
            m = CITE.search(line)
            if not m:
                continue
            jpath = ROOT / f"BENCH_r{m.group(1)}.json"
            if not jpath.exists():
                continue
            vals = _json_numbers(jpath)
            for num in NUM.findall(line):
                x = float(num)
                # a cited decimal must match some bench field to the quoted
                # precision (ratios like 1.618 quoted as 1.62 are fine)
                prec = len(num.split(".")[1])
                ok = any(
                    math.isclose(round(v, prec), x, abs_tol=10 ** -(prec + 3))
                    for v in vals)
                if not ok:
                    problems.append(f"{md.name}: '{line.strip()}' cites {num}"
                                    f" not found in {jpath.name}")
    assert not problems, "\n".join(problems)
