#!/usr/bin/env python3
"""Reference-as-oracle parity check (VERDICT r3 "Next round" #1).

Replays every input exported by `graft.tools.ParityExport` through the REAL
reference implementation (scholardoc_ocr.postprocess.postprocess,
quality._GarbledSignal.score, dictionary.DictionarySignal.score) and
byte/value-diffs against the Scala kernel outputs carried in the same
parquet rows. The reference's native-dependency imports (fitz, pytesseract,
PIL, surya, torch) are stubbed ONLY if absent — none of the compared code
paths touch them (confidence.py imports them at module load; the garbled /
dictionary / postprocess kernels are pure Python + re).

Usage:
    sbt "runMain graft.tools.ParityExport /root/testdata/sf0.1 /tmp/parity"
    python3 scripts/parity_reference.py /tmp/parity PARITY.md

Exit 0 and a committed PARITY.md with zero mismatches is the gate that
re-classifies q_postprocess_chain / q_garbled_signal from `no_oracle` to
reference-oracled.
"""
from __future__ import annotations

import importlib.util
import sys
import types

# Real numpy/pandas/pyarrow must load BEFORE any stubbing.
import pandas as pd  # noqa: E402
import pyarrow.dataset as pads  # noqa: E402


def _stub_missing(names: list[str]) -> list[str]:
    stubbed = []
    for name in names:
        if importlib.util.find_spec(name) is None and name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "PIL":
                mod.Image = types.ModuleType("PIL.Image")
                sys.modules["PIL.Image"] = mod.Image
            sys.modules[name] = mod
            stubbed.append(name)
    return stubbed


STUBBED = _stub_missing(["fitz", "pytesseract", "PIL", "surya", "torch"])
sys.path.insert(0, "/root/reference/src")

from scholardoc_ocr.dictionary import DictionarySignal  # noqa: E402
from scholardoc_ocr.postprocess import postprocess  # noqa: E402
from scholardoc_ocr.quality import QualityAnalyzer, _GarbledSignal  # noqa: E402

COUNT_KEYS = [
    ("c_unicode", "unicode_normalizations"),
    ("c_dehyph", "dehyphenations"),
    ("c_parajoin", "paragraph_joins"),
    ("c_punct", "punctuation_fixes"),
]


def main() -> int:
    in_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PARITY.md"

    df = pads.dataset(in_dir).to_table().to_pandas()
    garbled = _GarbledSignal(threshold=0.85, max_samples=10)
    dictionary = DictionarySignal()
    analyzer = QualityAnalyzer(threshold=0.85, max_samples=10)

    kernels = ["post_text", "post_counts", "garbled", "dictionary", "composite"]
    mismatches: dict[str, list[str]] = {k: [] for k in kernels}
    checked = 0

    for row in df.itertuples(index=False):
        text = row.text if isinstance(row.text, str) else ""
        checked += 1

        counts: dict = {}
        ref_post = postprocess(text, counts=counts)
        if ref_post != row.post_text:
            i = next(
                (k for k in range(min(len(ref_post), len(row.post_text)))
                 if ref_post[k] != row.post_text[k]),
                min(len(ref_post), len(row.post_text)),
            )
            mismatches["post_text"].append(
                f"{row.id}: first diff at char {i}: "
                f"ref={ref_post[max(0, i - 20):i + 20]!r} "
                f"spark={row.post_text[max(0, i - 20):i + 20]!r}"
            )
        for col, key in COUNT_KEYS:
            ref_v = counts.get(key, 0)
            spark_v = int(getattr(row, col))
            if ref_v != spark_v:
                mismatches["post_counts"].append(
                    f"{row.id}: {key} ref={ref_v} spark={spark_v}"
                )

        g = garbled.score(text)
        g_issues = list(row.g_issues) if row.g_issues is not None else []
        if (
            g.score != row.g_score
            or g.details["garbled_count"] != int(row.g_count)
            or g.details["total_words"] != int(row.g_total)
            or list(g.details["sample_issues"]) != g_issues
        ):
            mismatches["garbled"].append(
                f"{row.id}: ref=(score={g.score}, n={g.details['garbled_count']}/"
                f"{g.details['total_words']}, issues={g.details['sample_issues']}) "
                f"spark=(score={row.g_score}, n={row.g_count}/{row.g_total}, "
                f"issues={g_issues})"
            )

        qa = analyzer.analyze(text)  # confidence_data=None: two-signal path
        if qa.score != row.qa_score or bool(qa.flagged) != bool(row.qa_flagged):
            mismatches["composite"].append(
                f"{row.id}: ref=(score={qa.score}, flagged={qa.flagged}) "
                f"spark=(score={row.qa_score}, flagged={row.qa_flagged})"
            )

        d = dictionary.score(text)
        if (
            d.score != row.d_score
            or d.details["known_count"] != int(row.d_known)
            or d.details["unknown_structured"] != int(row.d_structured)
            or d.details["unknown_garbled"] != int(row.d_garbled)
            or d.details["total"] != int(row.d_total)
        ):
            mismatches["dictionary"].append(
                f"{row.id}: ref=(score={d.score}, {d.details}) "
                f"spark=(score={row.d_score}, known={row.d_known}, "
                f"structured={row.d_structured}, garbled={row.d_garbled}, "
                f"total={row.d_total})"
            )

    n_bad = sum(len(v) for v in mismatches.values())
    by_prefix = df["id"].str.split(":").str[0].value_counts().to_dict()

    lines = [
        "# PARITY — reference-as-oracle kernel check",
        "",
        "The REAL reference Python (`scholardoc_ocr.postprocess.postprocess`,",
        "`quality._GarbledSignal.score`, `dictionary.DictionarySignal.score`)",
        "replayed over every input exported by `graft.tools.ParityExport`,",
        "value-diffed against the Scala kernels (`Postprocess.apply`,",
        "`GarbledSignal.score`, `DictionarySignal.score`). Regenerate with:",
        "",
        "```",
        'sbt "runMain graft.tools.ParityExport /root/testdata/sf0.1 /tmp/parity"',
        "python3 scripts/parity_reference.py /tmp/parity PARITY.md",
        "```",
        "",
        "Both sides score the dictionary signal with the reference's own",
        "bundled word list (`data/wordlist.txt`, loaded with `_load_words`",
        "semantics on each side) — the kernel is parameterized by vocabulary",
        "on both sides, so this proves kernel-logic parity independent of",
        "which word list a deployment ships.",
        "",
        "The composite row also settles the PER-PAGE gate: the reference's",
        "`get_bad_pages(page_texts)` (quality.py:368-377, the selective-",
        "reprocessing decision) is exactly `analyze(text).flagged` mapped",
        "over the page list, so flag parity on arbitrary texts implies",
        "bad-page-set parity on arbitrary page lists by construction.",
        "",
        f"- rows checked: **{checked}**"
        f" ({', '.join(f'{k}: {v}' for k, v in sorted(by_prefix.items()))})",
        f"- import stubs needed: {STUBBED or 'none'}"
        " (none touched by the compared kernels)",
        "",
        "| kernel | fields compared | mismatches |",
        "|---|---|---|",
        "| postprocess text | exact string equality | "
        f"**{len(mismatches['post_text'])}** |",
        "| postprocess counters | 4 counter keys, exact | "
        f"**{len(mismatches['post_counts'])}** |",
        "| garbled signal | score (exact float), garbled_count, total_words,"
        f" sample_issues list | **{len(mismatches['garbled'])}** |",
        "| dictionary signal | score (exact float), known/structured/garbled/"
        f"total | **{len(mismatches['dictionary'])}** |",
        "| composite quality (A4) | weighted composite score (exact float) +"
        f" flagged (floors) | **{len(mismatches['composite'])}** |",
        "",
        f"**Verdict: {'PASS — 0 mismatches' if n_bad == 0 else f'FAIL — {n_bad} mismatches'}**",
        "",
    ]
    if n_bad:
        lines.append("## First mismatches per kernel")
        for k in kernels:
            for m in mismatches[k][:5]:
                lines.append(f"- `{k}`: {m}")
        lines.append("")

    with open(out_md, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"checked={checked} mismatches={n_bad} -> {out_md}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
