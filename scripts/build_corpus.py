"""Build the air-gapped real-text corpus + BPE tokenizer for the precision study.

The reference's precision protocol fine-tunes on OpenMathInstruct-2 with the
pretrained Llama tokenizer (``/root/reference/train_fp8.py:316-356``). This
environment has zero egress — no HF hub, no dataset cache — so the study
runs the same protocol on the largest *real* text distribution available on
disk: Python source and documentation from the installed packages
(hundreds of MB of real code+prose), tokenized by a real byte-level BPE
tokenizer trained on that corpus with the ``tokenizers`` library.

Deterministic: file list sorted, shuffle seeded, so the corpus is exactly
reproducible from the same image.

Usage:
    python scripts/build_corpus.py --out_dir /tmp/llm_fp8_corpus \
        --max_mb 256 --vocab_size 32768
"""
from __future__ import annotations

import argparse
import glob
import os
import random


def collect_files(max_bytes: int) -> list[str]:
    """Deterministic mixed corpus: all markdown/rst docs first (English
    prose), then Python source files shuffled with a fixed seed until the
    byte budget is reached."""
    roots = ["/opt/venv/lib/python3.12/site-packages"]
    docs, code = [], []
    for root in roots:
        docs += sorted(glob.glob(f"{root}/**/*.md", recursive=True))
        docs += sorted(glob.glob(f"{root}/**/*.rst", recursive=True))
        code += sorted(glob.glob(f"{root}/**/*.py", recursive=True))
    random.Random(42).shuffle(code)

    picked, total = [], 0
    for f in docs + code:
        try:
            size = os.path.getsize(f)
        except OSError:
            continue
        if size < 256 or size > 2 * 2**20:  # skip stubs and generated blobs
            continue
        picked.append(f)
        total += size
        if total >= max_bytes:
            break
    return picked


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/llm_fp8_corpus")
    ap.add_argument("--max_mb", type=int, default=256)
    ap.add_argument("--vocab_size", type=int, default=32768)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    corpus_path = os.path.join(args.out_dir, "corpus.txt")
    tok_path = os.path.join(args.out_dir, "tokenizer.json")

    files = collect_files(args.max_mb * 2**20)
    n_bytes = 0
    with open(corpus_path, "w", encoding="utf-8") as out:
        for f in files:
            try:
                with open(f, encoding="utf-8", errors="ignore") as fh:
                    text = fh.read()
            except OSError:
                continue
            out.write(text)
            # Document separator: blank line + NUL-free sentinel the
            # tokenizer learns as a normal token sequence.
            out.write("\n\n")
            n_bytes += len(text)
    print(f"corpus: {len(files)} files, {n_bytes/2**20:.1f} MiB -> {corpus_path}")

    from tokenizers import ByteLevelBPETokenizer

    tok = ByteLevelBPETokenizer()
    tok.train(
        [corpus_path],
        vocab_size=args.vocab_size,
        min_frequency=2,
        special_tokens=["<pad>", "<s>", "</s>"],
    )
    tok.save(tok_path)
    print(f"tokenizer: vocab {tok.get_vocab_size()} -> {tok_path}")


if __name__ == "__main__":
    main()
