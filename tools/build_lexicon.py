"""Build the frontend lexicon artifacts from public data + corpus alignments.

Outputs (under tacotronv2_wavernn_chinese_tpu/frontend/data/):

* ``symbols.txt``      — frozen 191-entry phoneme symbol table (pad ``_``, eos
  ``~``, initials/finals with tone digits, 4 punctuation marks).  Derived the
  same way the reference derives its vocabulary (unique tokens of the corpus
  metadata, reference tacotron/utils/symbols.py:12-28) but frozen to a
  versioned artifact so checkpoints never depend on a train-time scan.
* ``char_pinyin.tsv``  — hanzi -> comma-separated tone-digit syllables
  (default reading first).  Converted from the public mozillazg pinyin-data
  codepoint table (diacritics -> tone digits), with per-char default readings
  re-ranked by observed frequency in the corpus alignments.
* ``phrase_pinyin.tsv``— polyphone-disambiguation phrases (phrase -> syllable
  sequence), mined from corpus (text, pinyin) alignments: we keep phrases that
  contain a char whose reading inside the phrase differs from its default and
  whose reading is consistent across occurrences.  This replaces the
  reference's ``large_pinyin.txt`` (absent from the mount).

Usage:
    python tools/build_lexicon.py \
        --pinyin-data /root/reference/tacotron/pinyin/pinyin.txt \
        --corpus /root/reference/train.txt \
        --out tacotronv2_wavernn_chinese_tpu/frontend/data
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tacotronv2_wavernn_chinese_tpu.frontend.pinyin_utils import (  # noqa: E402
    INITIALS,
    diacritic_to_digit,
)

PUNCT = {"，", "。", "？", "！"}


def load_mozillazg(path: str) -> dict[str, list[str]]:
    """Parse the mozillazg pinyin-data codepoint table into hanzi -> readings."""
    table: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            m = re.match(r"U\+([0-9A-Fa-f]+):\s*([^#]+)(?:#\s*(.*))?", line)
            if not m:
                continue
            char = chr(int(m.group(1), 16))
            readings = []
            for r in m.group(2).split(","):
                r = r.strip()
                if r:
                    readings.append(diacritic_to_digit(r))
            if readings:
                table[char] = readings
    return table


def merge_split_tokens(tokens: list[str]) -> list[str] | None:
    """Re-join 'h ao3' style initial/final pairs into whole syllables."""
    out = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t in INITIALS and i + 1 < len(tokens) and tokens[i + 1] not in PUNCT:
            nxt = tokens[i + 1]
            if nxt not in INITIALS and nxt[0].isalpha():
                out.append(t + nxt)
                i += 2
                continue
            return None  # two initials in a row: malformed
        out.append(t)
        i += 1
    return out


def align_corpus(corpus: str):
    """Yield per-utterance (chars, syllables) alignments; count failures."""
    ok, bad = 0, 0
    aligned = []
    with open(corpus, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) < 6:
                continue
            text, pyin = parts[4], parts[5]
            syls = merge_split_tokens(pyin.split(" "))
            if syls is None or len(syls) != len(text):
                bad += 1
                continue
            aligned.append((text, syls))
            ok += 1
    print(f"alignment: {ok} ok, {bad} failed")
    return aligned


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pinyin-data", required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-phrase", type=int, default=4)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    table = load_mozillazg(args.pinyin_data)
    aligned = align_corpus(args.corpus)

    # ---- per-char reading frequencies from the corpus ----
    char_freq: dict[str, collections.Counter] = collections.defaultdict(collections.Counter)
    for text, syls in aligned:
        for ch, syl in zip(text, syls):
            if ch in PUNCT:
                continue
            char_freq[ch][syl] += 1

    # ---- char dictionary: corpus-majority default, mozillazg fallback ----
    chars = sorted(set(table) | set(char_freq))
    char_rows = []
    for ch in chars:
        readings = list(table.get(ch, []))
        if char_freq.get(ch):
            default = char_freq[ch].most_common(1)[0][0]
            if default in readings:
                readings.remove(default)
            readings.insert(0, default)
        if readings:
            char_rows.append((ch, readings))

    char_default = {ch: rs[0] for ch, rs in char_rows}

    # ---- phrase mining: contexts where a char deviates from its default ----
    # phrase -> Counter(reading-tuple)
    phrase_freq: dict[str, collections.Counter] = collections.defaultdict(collections.Counter)
    for text, syls in aligned:
        n = len(text)
        for i in range(n):
            ch = text[i]
            if ch in PUNCT or char_default.get(ch) == syls[i]:
                continue
            # char i read non-default: record every window containing it
            for width in range(2, args.max_phrase + 1):
                for start in range(max(0, i - width + 1), min(i + 1, n - width + 1)):
                    window = text[start : start + width]
                    if any(c in PUNCT for c in window):
                        continue
                    phrase_freq[window][tuple(syls[start : start + width])] += 1

    # keep phrases with a dominant (>=90%) reading; prefer shortest phrases
    phrases: dict[str, tuple[str, ...]] = {}
    for phrase, counter in phrase_freq.items():
        reading, cnt = counter.most_common(1)[0]
        total = sum(counter.values())
        if cnt / total >= 0.9:
            phrases[phrase] = reading

    print(f"initial phrases: {len(phrases)} (of {len(phrase_freq)} candidates)")

    # ---- iterative refinement: mine correction phrases from residual errors
    from tacotronv2_wavernn_chinese_tpu.frontend.g2p import Lexicon, get_pyin

    def make_lexicon(phrase_map: dict[str, tuple[str, ...]]) -> Lexicon:
        return Lexicon.from_dicts({ch: rs for ch, rs in char_rows}, phrase_map)

    def evaluate(lex: Lexicon):
        """Return (exact, token_acc, error list of (text, syls, pred_syls))."""
        exact = 0
        tok_match = tok_total = 0
        errors = []
        for text, syls in aligned:
            pred, _ = get_pyin(text, lexicon=lex)
            pred_syls = merge_split_tokens(pred.split(" "))
            if pred_syls == syls:
                exact += 1
                tok_match += len(syls)
                tok_total += len(syls)
            else:
                if pred_syls is not None and len(pred_syls) == len(syls):
                    tok_match += sum(1 for a, b in zip(pred_syls, syls) if a == b)
                    errors.append((text, syls, pred_syls))
                tok_total += len(syls)
        return exact, tok_match / max(tok_total, 1), errors

    for it in range(6):
        lex = make_lexicon(phrases)
        exact, tok_acc, errors = evaluate(lex)
        print(f"iter {it}: exact {exact}/{len(aligned)} token_acc {tok_acc:.5f} "
              f"phrases {len(phrases)}")
        if not errors:
            break
        # mine corrections: for each wrong position, add the smallest context
        # window (centered preference) whose observed reading is consistent
        corr: dict[str, collections.Counter] = collections.defaultdict(collections.Counter)
        for text, syls, pred_syls in errors:
            n = len(text)
            for i in range(n):
                if pred_syls[i] == syls[i] or text[i] in PUNCT:
                    continue
                for width in range(2, args.max_phrase + 1):
                    for start in range(max(0, i - width + 1), min(i + 1, n - width + 1)):
                        window = text[start : start + width]
                        if any(c in PUNCT for c in window):
                            continue
                        corr[window][tuple(syls[start : start + width])] += 1
        # verify each candidate against ALL corpus occurrences before adding
        occur: dict[str, collections.Counter] = collections.defaultdict(collections.Counter)
        cand = set(corr)
        for text, syls in aligned:
            n = len(text)
            for width in range(2, args.max_phrase + 1):
                for start in range(0, n - width + 1):
                    window = text[start : start + width]
                    if window in cand:
                        occur[window][tuple(syls[start : start + width])] += 1
        added = 0
        # shortest windows first; longer windows only if shorter didn't fix
        for window in sorted(cand, key=len):
            counter = occur[window]
            reading, cnt = counter.most_common(1)[0]
            if cnt / sum(counter.values()) >= 0.9 and phrases.get(window) != reading:
                phrases[window] = reading
                added += 1
        if added == 0:
            break

    pruned = dict(sorted(phrases.items(), key=lambda kv: (len(kv[0]), kv[0])))
    print(f"phrases kept: {len(pruned)}")

    # ---- symbol table: unique split tokens of the corpus + pad/eos ----
    toks: set[str] = set()
    with open(args.corpus, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            for t in parts[-1].split(" "):
                if t:
                    toks.add(t)
    symbols = ["_", "~"] + sorted(toks)
    print(f"symbols: {len(symbols)}")

    with open(os.path.join(args.out, "symbols.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(symbols) + "\n")
    with open(os.path.join(args.out, "char_pinyin.tsv"), "w", encoding="utf-8") as f:
        for ch, readings in char_rows:
            f.write(f"{ch}\t{','.join(readings)}\n")
    with open(os.path.join(args.out, "phrase_pinyin.tsv"), "w", encoding="utf-8") as f:
        for phrase, reading in pruned.items():
            f.write(f"{phrase}\t{' '.join(reading)}\n")


if __name__ == "__main__":
    main()
