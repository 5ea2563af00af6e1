#!/usr/bin/env python3
"""Golden generator for the differential pipeline test.

Loads the REFERENCE's pure functions (clean_text_for_json,
get_consensus_text, calculate_confidence, detect_language_from_text)
directly from /root/reference/main.py source (the module itself imports
fastapi etc., so we exec just the function defs), then replays the
reference's extraction orchestration over the raw per-page pass dump
produced by `sbt "runMain graft.tools.DumpRaw"`:

  per page: N==1 -> text as-is, conf 100  (main.py:238-240)
            N>1  -> consensus + pairwise confidence (main.py:241-243)
  clean -> keep if non-empty (pdf/text/html, main.py:367) or always (image,
  main.py:414); confidence accumulates for every physical page
  (main.py:532); avg = sum/physical (main.py:546, 0 if no pages);
  language over " ".join(kept) (main.py:561); totals main.py:574-575.

Output: one golden file per level, line-based (span text is post-clean ->
single-line printable ASCII, so TAB-separated lines are safe):

  D <doc_id> <confidence-repr> <lang> <total_pages> <character_count>
  S <kind> <offset> <media_ref> <text>

Run driver-side only (python is not available to the Scala code).
"""
import ast
import json
import re
import sys
from collections import Counter
from difflib import SequenceMatcher

REF = "/root/reference/main.py"
WANTED = {
    "clean_text_for_json",
    "detect_language_from_text",
    "get_consensus_text",
    "calculate_confidence",
}


def load_reference_functions():
    src = open(REF).read()
    tree = ast.parse(src)
    keep = [n for n in tree.body
            if isinstance(n, (ast.FunctionDef,)) and n.name in WANTED]
    mod = ast.Module(body=keep, type_ignores=[])
    ns = {"re": re, "Counter": Counter, "SequenceMatcher": SequenceMatcher}
    exec(compile(mod, REF, "exec"), ns)
    missing = WANTED - set(ns)
    if missing:
        raise SystemExit(f"missing reference functions: {missing}")
    return ns


def golden_doc(ns, doc):
    clean = ns["clean_text_for_json"]
    consensus = ns["get_consensus_text"]
    confidence = ns["calculate_confidence"]
    detect = ns["detect_language_from_text"]

    kept = []  # (kind, text, media_ref)
    total_conf = 0.0
    physical = 0
    for page in doc["pages"]:
        passes = page["passes"]
        if len(passes) == 1:
            text, conf = passes[0], 100.0
        else:
            text, conf = consensus(passes), confidence(passes)
        cleaned = clean(text)
        physical += 1
        total_conf += conf
        if page["keep_empty"] or cleaned.strip():
            kept.append((page["kind"], cleaned, page["media_ref"]))
    avg = total_conf / physical if physical > 0 else 0
    joined = " ".join(t for _, t, _ in kept)
    return {
        "doc_id": doc["doc_id"],
        "spans": [(k, t, m, i) for i, (k, t, m) in enumerate(kept)],
        "confidence": float(avg),
        "detected_language": detect(joined),
        "total_pages": len(kept),
        "character_count": sum(len(t) for _, t, _ in kept),
    }


def main(dump_dir, out_dir):
    ns = load_reference_functions()
    for level in ("low", "medium", "high", "ultra"):
        dump = json.load(open(f"{dump_dir}/raw_{level}.json"))
        assert dump["level"] == level
        lines = []
        for doc in dump["docs"]:
            g = golden_doc(ns, doc)
            lines.append("D\t%s\t%r\t%s\t%d\t%d" % (
                g["doc_id"], g["confidence"], g["detected_language"],
                g["total_pages"], g["character_count"]))
            for k, t, m, i in g["spans"]:
                assert "\t" not in t and "\n" not in t, "clean text must be single-line"
                lines.append("S\t%s\t%d\t%s\t%s" % (k, i, m, t))
        path = f"{out_dir}/golden_{level}.txt"
        open(path, "w").write("\n".join(lines) + "\n")
        print(f"wrote {path}: {sum(1 for l in lines if l[0] == 'D')} docs")


if __name__ == "__main__":
    dump_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_dump"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources"
    main(dump_dir, out_dir)
