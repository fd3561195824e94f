"""Mine phrase-pinyin overrides from the reference corpus G2P pairs.

The reference's phrase dictionary (``large_pinyin.txt``) is absent from the
mount (listed in ``.MISSING_LARGE_BLOBS``); ours is rebuilt from public
mozillazg phrase data by ``tools/build_lexicon.py``, so ~1% of train.txt
sentences disagree with the reference G2P output (reference
tacotron/pinyin/parse_text_to_pyin.py:164-236 produced the pyin column of
train.txt). SURVEY.md §7 sanctions deriving the remaining phrase entries
"from train.txt alignments" — that is what this tool does:

1. run our ``get_pyin`` over every (text, pyin) pair in train.txt;
2. for each mismatch, align reference and our token streams back to the
   hanzi units of the normalized text (one syllable per hanzi);
3. emit the minimal hanzi n-gram around each disagreement as a candidate
   phrase override carrying the reference reading;
4. iteratively evaluate the candidate set over the full corpus, dropping
   any override that regresses previously-matching sentences;
5. write the surviving set to ``frontend/data/phrase_overrides.tsv``
   (loaded by ``default_lexicon`` with replace-same-key precedence).

Usage: python -m tools.mine_lexicon_overrides [--train /root/reference/train.txt]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tacotronv2_wavernn_chinese_tpu.frontend.g2p import (  # noqa: E402
    Lexicon,
    _DATA_DIR,
    get_pyin,
)
from tacotronv2_wavernn_chinese_tpu.frontend.normalize import (  # noqa: E402
    KEPT_PUNCT,
    normalize_text,
)
from tacotronv2_wavernn_chinese_tpu.frontend.pinyin_utils import (  # noqa: E402
    INITIALS,
    join_split_tokens,
)

_ASCII = re.compile(r"[a-z0-9#]")
_HANZI = re.compile(r"[㐀-鿿]")

OVERRIDES_PATH = os.path.join(_DATA_DIR, "phrase_overrides.tsv")


def read_pairs(train_txt: str) -> list[tuple[str, str]]:
    pairs = []
    with open(train_txt, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) >= 6:
                pairs.append((parts[4], parts[5]))
    return pairs


def to_syllables(token_str: str) -> list[str]:
    """'k an4 k an' -> ['kan4', 'kan'] (punct marks stay standalone)."""
    return join_split_tokens([t for t in token_str.split(" ") if t])


def units_of(normalized: str) -> list[str] | None:
    """One unit per hanzi/punct; None if the text has ascii/digit content."""
    if _ASCII.search(normalized):
        return None
    if " " in normalized:
        # segment_spans matches on contiguous units; get_pyin cannot match a
        # phrase across a space, so skip spaced sentences to stay in lockstep
        return None
    units = []
    for ch in normalized:
        if _HANZI.match(ch) or ch in KEPT_PUNCT:
            units.append(ch)
        else:
            return None
    return units


def segment_spans(units: list[str], lexicon: Lexicon) -> list[tuple[int, int]]:
    """Replicate get_pyin's greedy scan over hanzi/punct units.

    Returns [start, end) unit spans — one per phrase match or single char.
    An override can only fire if its phrase starts at a span start, so
    candidates must be built from whole spans.
    """
    text = "".join(units)
    spans = []
    i = 0
    while i < len(units):
        matched = 0
        for phrase, _ in lexicon.phrase.get(units[i], ()):
            if text.startswith(phrase, i):
                matched = len(phrase)
                break
        step = matched or 1
        spans.append((i, i + step))
        i += step
    return spans


def mine_candidates(
    pairs: list[tuple[str, str]], lexicon: Lexicon
) -> dict[str, str]:
    """Candidate phrase -> reference reading, from aligned disagreements."""
    votes: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for text, ref in pairs:
        ours, normalized = get_pyin(text, lexicon=lexicon)
        if ours == ref:
            continue
        units = units_of(normalized)
        if units is None:
            continue
        ref_syls = to_syllables(ref)
        our_syls = to_syllables(ours)
        if not (len(ref_syls) == len(our_syls) == len(units)):
            continue
        diffs = [
            i
            for i, (r, o) in enumerate(zip(ref_syls, our_syls))
            if r != o and units[i] not in KEPT_PUNCT
        ]
        spans = segment_spans(units, lexicon)
        span_of = {}
        for s in spans:
            for u in range(s[0], s[1]):
                span_of[u] = s
        # group consecutive diff positions; expand each group to cover the
        # full greedy-scan segments it touches so the override can match.
        # Also propose variants extended by one neighbouring segment — the
        # extra context disambiguates words the reference reads differently
        # depending on surroundings (longest-match gives them precedence).
        span_starts = {s[0]: k for k, s in enumerate(spans)}
        i = 0
        while i < len(diffs):
            j = i
            while j + 1 < len(diffs) and diffs[j + 1] == diffs[j] + 1:
                j += 1
            lo = span_of[diffs[i]][0]
            hi = span_of[diffs[j]][1]
            k_lo = span_starts[lo]
            k_hi = span_starts[span_of[diffs[j]][0]]
            exts = [(lo, hi)]
            if k_lo > 0:
                exts.append((spans[k_lo - 1][0], hi))
            if k_hi + 1 < len(spans):
                exts.append((lo, spans[k_hi + 1][1]))
            if k_lo > 0 and k_hi + 1 < len(spans):
                exts.append((spans[k_lo - 1][0], spans[k_hi + 1][1]))
            for a, b in exts:
                phrase = "".join(units[a:b])
                # shortest-first acceptance (below) keeps entries word-sized
                # whenever a word-sized form suffices; the cap bounds how much
                # sentence context an otherwise-unfixable case may memorize
                if len(phrase) <= 10 and not any(u in KEPT_PUNCT for u in phrase):
                    votes[phrase][" ".join(ref_syls[a:b])] += 1
            i = j + 1
    return {p: c.most_common(1)[0][0] for p, c in votes.items()}


def evaluate(
    pairs: list[tuple[str, str]], lexicon: Lexicon
) -> tuple[int, list[int]]:
    bad = [
        i
        for i, (text, ref) in enumerate(pairs)
        if get_pyin(text, lexicon=lexicon)[0] != ref
    ]
    return len(bad), bad


def with_overrides(base: Lexicon, overrides: dict[str, str]) -> Lexicon:
    phrase_map: dict[str, tuple[str, ...]] = {}
    for entries in base.phrase.values():
        for p, r in entries:
            phrase_map[p] = tuple(r)
    for p, r in overrides.items():
        phrase_map[p] = tuple(r.split(" "))
    return Lexicon.from_dicts(base.char, phrase_map)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default="/root/reference/train.txt")
    ap.add_argument("--out", default=OVERRIDES_PATH)
    ap.add_argument("--max-rounds", type=int, default=6)
    args = ap.parse_args()

    pairs = read_pairs(args.train)
    base = Lexicon(
        os.path.join(_DATA_DIR, "char_pinyin.tsv"),
        os.path.join(_DATA_DIR, "phrase_pinyin.tsv"),
    )
    normalized = [normalize_text(t) for t, _ in pairs]
    n0, _ = evaluate(pairs, base)
    print(f"baseline mismatches: {n0}/{len(pairs)}")

    overrides: dict[str, str] = {}
    best_overrides: dict[str, str] = {}
    best_n = n0
    for rnd in range(args.max_rounds):
        lex = with_overrides(base, overrides)
        cands = mine_candidates(pairs, lex)
        new = {p: r for p, r in cands.items() if overrides.get(p) != r}
        if not new:
            break
        # score each candidate alone on just the sentences containing it:
        # accept iff it strictly nets more fixed than broken sentences.
        # Shorter (dictionary-word-sized) candidates are tried first; longer
        # context-specific ones only survive if the short form was rejected.
        accepted = 0
        cur_lex = lex
        for p, r in sorted(new.items(), key=lambda kv: len(kv[0])):
            subset = [i for i, norm in enumerate(normalized) if p in norm]
            before = [get_pyin(pairs[i][0], lexicon=cur_lex)[0] == pairs[i][1] for i in subset]
            trial_lex = with_overrides(base, {**overrides, p: r})
            after = [get_pyin(pairs[i][0], lexicon=trial_lex)[0] == pairs[i][1] for i in subset]
            fixes = sum(a and not b for a, b in zip(after, before))
            breaks = sum(b and not a for a, b in zip(after, before))
            if fixes > breaks:
                overrides[p] = r
                cur_lex = trial_lex
                accepted += 1
        n, _ = evaluate(pairs, with_overrides(base, overrides))
        print(
            f"round {rnd}: {len(new)} candidates, {accepted} accepted,"
            f" mismatches {n}/{len(pairs)}"
        )
        if n >= best_n:
            overrides = best_overrides
            break
        best_n, best_overrides = n, dict(overrides)

    with open(args.out, "w", encoding="utf-8") as f:
        for p in sorted(overrides):
            f.write(f"{p}\t{overrides[p]}\n")
    print(f"wrote {len(overrides)} overrides -> {args.out}; final {best_n}/{len(pairs)}")


if __name__ == "__main__":
    main()
