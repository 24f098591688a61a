"""Citation-integrity guard (VERDICT r2 weak #2 / next #7).

CLAUDE.md makes reference-citation accuracy a repo rule: every
``/root/reference/<path>[:lines]`` mention in package code and docs must
point at a file that actually exists, and any cited line range must be
in-range for that file. This walks all of them mechanically so phantom
citations (like the former ``serving/ecapa_int8.py`` pointing at a
non-existent ``test.py``) can't survive a round.

Skipped gracefully when /root/reference is not mounted (e.g. CI images
without the read-only reference checkout).
"""

import pathlib
import re

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference")

# /root/reference/<relpath>[:N[-M]] — relpath stops before whitespace,
# quotes, parens/brackets, backticks, or a colon that starts a line spec.
_CITE = re.compile(
    r"/root/reference/([A-Za-z0-9_./*-]+?)(?::(\d+)(?:-(\d+))?)?(?=[\s'\"`()\[\]{},;!?<>|]|:\D|$)"
)

# Files whose /root/reference mentions are prose about the tree itself,
# not code citations (judge/advisor text is not ours to fix).
_EXCLUDE = {"VERDICT.md", "ADVICE.md", "SURVEY.md", "PROGRESS.jsonl"}


def _sources():
    for pattern in ("asvspoof2021_air_tpu/**/*.py", "docs/*.md", "tests/*.py",
                    "tools/**/*.py", "native/**/*.cc", "native/**/*.h",
                    "*.py", "*.md"):
        for p in REPO.glob(pattern):
            if p.name in _EXCLUDE or ".git" in p.parts:
                continue
            yield p


def _citations():
    for p in _sources():
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for m in _CITE.finditer(text):
            line_no = text.count("\n", 0, m.start()) + 1
            yield p.relative_to(REPO), line_no, m.group(1), m.group(2), m.group(3)


@pytest.mark.skipif(not REF.is_dir(), reason="reference tree not mounted")
def test_reference_citations_resolve():
    cites = list(_citations())
    assert len(cites) > 50, "citation scanner should find the repo's citations"
    bad = []
    line_counts = {}
    for src, src_line, rel, lo, hi in cites:
        if "*" in rel:  # glob citation, e.g. channel_simulation/simulated_*.py
            if not list(REF.glob(rel)):
                bad.append(f"{src}:{src_line} -> {rel} (glob matches nothing)")
            continue
        target = REF / rel
        if not target.exists():
            # A directory cite like channel_simulation/ is fine; a file must be.
            bad.append(f"{src}:{src_line} -> {rel} (missing)")
            continue
        if lo is not None and target.is_file():
            if rel not in line_counts:
                line_counts[rel] = target.read_text(errors="replace").count("\n") + 1
            n = line_counts[rel]
            last = int(hi) if hi else int(lo)
            if int(lo) < 1 or last > n:
                bad.append(f"{src}:{src_line} -> {rel}:{lo}"
                           f"{'-' + hi if hi else ''} (file has {n} lines)")
    assert not bad, "stale reference citations:\n" + "\n".join(bad)
