"""Harvest a realistic English prose corpus from the pyspark
docstrings installed in this container (~1.5 MB, ~232k tokens, ~7k
distinct words) — the input for the BPE/unigram trainer studies in
SCALE.md round-9(2). Reproducible from a clean environment: no
network, no external data.

Usage: python scripts/make_english_corpus.py [out_path]
"""

from __future__ import annotations

import ast
import os
import re
import sys


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/english_corpus.txt"
    import pyspark

    root = os.path.dirname(pyspark.__file__)
    texts = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            try:
                src = open(
                    os.path.join(dirpath, f), encoding="utf8", errors="ignore"
                ).read()
                tree = ast.parse(src)
            except (SyntaxError, OSError):
                continue
            for node in ast.walk(tree):
                if isinstance(
                    node,
                    (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
                ):
                    d = ast.get_docstring(node)
                    if d and len(d) > 80:
                        texts.append(d)
    lines = [
        ln.strip()
        for ln in "\n".join(texts).splitlines()
        if ln.strip()
        and not ln.strip().startswith((">>>", "...", ".. ", ":", "+--", "|", "#"))
        and re.search(r"[a-z]{3}.*[a-z]{3}", ln)
    ]
    corpus = re.sub(r"[^a-z' ]+", " ", " ".join(lines).lower())
    with open(out_path, "w") as fh:
        fh.write(corpus)
    words = [w for w in corpus.split() if w]
    print(
        f"{out_path}: {len(words)} tokens, {len(set(words))} distinct, "
        f"{len(corpus)} chars"
    )


if __name__ == "__main__":
    main()
