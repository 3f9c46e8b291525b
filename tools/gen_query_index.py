#!/usr/bin/env python3
"""Regenerate the mechanical query index in SURVEY.md §2.1 (VERDICT r7
item 8: the hand-written coverage table stopped at q191 while the
surface grew to q368+; prose must not re-derive the mapping).

Scans src/main/scala/graft for every QueryDef name literal ("qNNN_x"),
maps it to its defining file, cross-references the fuzz-harness
registration (tools/fuzz_oracle.py QUERIES) and the streaming twins
(grep for the query id in streaming scaladoc), and rewrites the block
between the GEN-QUERY-INDEX markers in SURVEY.md. Run after adding a
query; the table IS generated — never hand-edit inside the markers.
"""
import re
import subprocess
from pathlib import Path

REPO = Path("/root/repo")
SRC = REPO / "src/main/scala/graft"
BEGIN = "<!-- GEN-QUERY-INDEX:BEGIN (tools/gen_query_index.py) -->"
END = "<!-- GEN-QUERY-INDEX:END -->"


def main():
    qdef = {}
    for p in sorted(SRC.rglob("*.scala")):
        text = p.read_text()
        for m in re.finditer(r'"(q\d+_[a-z0-9_]+)"', text):
            name = m.group(1)
            # first definition site wins (QueryDef name literal); other
            # mentions (doc strings, reuse) don't override
            qdef.setdefault(name, p.relative_to(SRC).as_posix())
    corr = sorted(qdef)
    fuzz = set(re.findall(r'"(q\d+_[a-z0-9_]+)"',
                          (REPO / "tools/fuzz_oracle.py").read_text()))
    stream = (SRC / "streaming/StreamOps.scala").read_text()
    # anchored to the twin-declaration phrases: a bare q\d+ scan also
    # matched incidental prose like "the exact q90 loss order
    # statistic" (a percentile, not a query id) and mislabeled
    # q90_chunking with a stream-twin gate (ADVICE r8). Scaladoc wraps
    # mid-phrase, so join the " * " continuation lines first.
    flat = re.sub(r"\n\s*\*\s?", " ", stream)
    twin_pats = [
        # "twin of qNNN" / "twin of [[graft...qNNNFoo]]"
        r"twin of (?:\[\[[\w.]*?[qQ]|q)(\d+)",
        r"q(\d+)'s streaming twin",
        # the "qNNN's <batch shape> as a live/continuous/production..."
        # opening-sentence convention (driftTv, vocabNovelty, ewma,
        # cusum, benford, entropy, sloBurn, psiDrift, qualityFilter)
        r"q(\d+)(?:'s| \w+[ -]\w+)? [^.]{0,80}? as (?:a live|a continuous"
        r"|a STATELESS|it runs|per-key|a \w+ per-window)",
        r"q(\d+)'s streaming sibling",   # entropyMonitor
        r"q(\d+)'s per-window half",     # sloBurnMonitor
    ]
    twins = {m for p in twin_pats for m in re.findall(p, flat)}

    def num(n):
        return int(n.split("_")[0][1:])

    rows = []
    for name in sorted(corr, key=num):
        gates = ["oracle"]
        if name in fuzz:
            gates.append("fuzz")
        if str(num(name)) in twins:
            gates.append("stream-twin")
        rows.append(f"| {name} | `{qdef[name]}` | {' + '.join(gates)} |")
    block = "\n".join([
        BEGIN,
        "",
        f"Generated query index — all {len(rows)} registered queries, "
        "their defining file, and gates (oracle = DuckDB hash gate; "
        "fuzz = value-domain redraw replay in tools/fuzz_oracle.py; "
        "stream-twin = a StreamOps stateful twin with batch-agreement "
        "spec). Regenerate with `python3 tools/gen_query_index.py`.",
        "",
        "| Query | Defined in (src/main/scala/graft/) | Gates |",
        "|---|---|---|",
        *rows,
        "",
        END,
    ])
    survey = (REPO / "SURVEY.md").read_text()
    if BEGIN in survey:
        pre = survey.split(BEGIN)[0]
        post = survey.split(END)[1]
        survey = pre + block + post
    else:
        anchor = "\n---\n\n## 3. Query lifecycle"
        survey = survey.replace(anchor, "\n" + block + "\n" + anchor)
    (REPO / "SURVEY.md").write_text(survey)
    print(f"wrote {len(rows)} index rows into SURVEY.md")


if __name__ == "__main__":
    main()
