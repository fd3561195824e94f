"""Frontend tests: normalization, numbers, G2P goldens, tokenizer."""

import os

import pytest

from tacotronv2_wavernn_chinese_tpu.frontend import (
    EOS,
    PAD,
    default_symbols,
    diacritic_to_digit,
    get_pyin,
    int_to_words,
    join_split_tokens,
    normalize_text,
    split_syllable,
)

REF_TRAIN = "/root/reference/train.txt"


def test_diacritic_to_digit():
    assert diacritic_to_digit("hǎo") == "hao3"
    assert diacritic_to_digit("zhōng") == "zhong1"
    assert diacritic_to_digit("lüè") == "lve4"
    assert diacritic_to_digit("de") == "de"
    assert diacritic_to_digit("ér") == "er2"
    assert diacritic_to_digit("nǚ") == "nv3"


def test_split_syllable():
    assert split_syllable("hao3") == ("h", "ao3")
    assert split_syllable("zhen3") == ("zh", "en3")
    assert split_syllable("chang2") == ("ch", "ang2")
    assert split_syllable("an1") == ("an1",)
    assert split_syllable("er3") == ("er3",)
    assert split_syllable("a1") == ("a1",)
    assert split_syllable("n2") == ("n2",)
    assert split_syllable("de") == ("d", "e")
    assert split_syllable("yu3") == ("y", "u3")
    # bare toneless initials (pre-split raw input) pass through whole
    assert split_syllable("n") == ("n",)
    assert split_syllable("zh") == ("zh",)


def test_get_pyin_presplit_raw_input():
    """The reference's documented raw form 'n i3 h ao3' passes through clean
    (parse_text_to_pyin.py:191 comment) — no empty tokens from bare initials."""
    assert get_pyin("n i3 h ao3")[0] == "n i3 h ao3"
    assert get_pyin("ni3 hao3")[0] == "n i3 h ao3"


def test_join_split_roundtrip():
    toks = "k a3 er3 p u3 ， h ao3 。".split(" ")
    assert join_split_tokens(toks) == ["ka3", "er3", "pu3", "，", "hao3", "。"]


def test_int_to_words():
    assert int_to_words("0") == "零"
    assert int_to_words("5") == "五"
    assert int_to_words("10") == "十"
    assert int_to_words("14") == "十四"
    assert int_to_words("110") == "一百一十"
    assert int_to_words("105") == "一百零五"
    assert int_to_words("1005") == "一千零五"
    assert int_to_words("10000") == "一万"
    assert int_to_words("10005") == "一万零五"
    assert int_to_words("100000005") == "一亿零五"
    # 16 digits is the last 万亿-group length; beyond that falls back to
    # digit-wise reading instead of raising (the reference's own unit table
    # crashes past 12 digits, parse_text_to_pyin.py:48)
    assert int_to_words("9999999999999999").endswith("九千九百九十九")
    assert int_to_words("12345678901234567") == "一二三四五六七八九零一二三四五六七"
    assert int_to_words("123456789").replace("，", "") == "一亿二千三百四十五万六千七百八十九"


def test_normalize_text():
    assert normalize_text("你好……") == "你好。"
    assert normalize_text("你好!!") == "你好！"
    assert normalize_text("他说：“来”。") == "他说，来。"
    assert normalize_text("a、b") == "a，b"
    assert normalize_text("#2你#3好#1") == "你好"
    assert normalize_text("#2你#3好", keep_prosody=True) == "#2你#3好"


def test_get_pyin_basic():
    pyin, text = get_pyin("你好。")
    assert pyin == "n i3 h ao3 。"
    assert text == "你好。"


def test_get_pyin_mixed_pinyin_passthrough():
    pyin, _ = get_pyin("ni3 hao3 世界。")
    assert pyin.startswith("n i3 h ao3 sh i4 j ie4")


def test_get_pyin_numbers():
    pyin, _ = get_pyin("25个")
    # 二十五个
    assert pyin == "er4 sh i2 w u3 g e4"


@pytest.mark.skipif(not os.path.exists(REF_TRAIN), reason="reference corpus absent")
def test_g2p_golden_corpus_sample():
    """Token-level agreement >= 99.5% on a 500-utterance golden slice."""
    total = match = 0
    with open(REF_TRAIN, encoding="utf-8") as f:
        lines = [next(f) for _ in range(500)]
    for line in lines:
        parts = line.strip().split("|")
        text, ref = parts[4], parts[5]
        pred, _ = get_pyin(text)
        a, b = pred.split(" "), ref.split(" ")
        match += sum(1 for x, y in zip(a, b) if x == y)
        total += max(len(a), len(b))
    assert match / total >= 0.995, f"token agreement {match / total:.4f}"


def test_symbols_frozen_table():
    syms = default_symbols()
    assert len(syms) == 191
    assert syms.symbols[0] == PAD and syms.symbols[1] == EOS
    assert syms.pad_id == 0 and syms.eos_id == 1


def test_tokenizer_encode_decode():
    syms = default_symbols()
    ids = syms.encode("n i3 h ao3 。")
    assert ids[-1] == syms.eos_id
    assert syms.decode(ids[:-1]) == "n i3 h ao3 。"
    # OOV silently dropped
    assert syms.encode("n i3 XOOVX", append_eos=False) == syms.encode(
        "n i3", append_eos=False
    )


def test_tokenizer_padded():
    syms = default_symbols()
    arr = syms.encode_padded("n i3", max_len=8)
    assert arr.shape == (8,)
    assert arr[2] == syms.eos_id and arr[3] == syms.pad_id


REF_TRAIN = "/root/reference/train.txt"


@pytest.mark.skipif(not os.path.exists(REF_TRAIN), reason="reference mount absent")
def test_g2p_agreement_full_reference_corpus():
    """G2P parity against ALL 10k (text, pyin) pairs the reference shipped
    (train.txt column 6): 100% exact sentences after corpus-mined phrase
    overrides (tools/mine_lexicon_overrides.py) plus context-sensitive
    (punctuation-bearing) overrides for the 3 residual polyphones."""
    from tacotronv2_wavernn_chinese_tpu.frontend import get_pyin as gp

    rows = [
        r
        for r in (l.strip().split("|") for l in open(REF_TRAIN, encoding="utf-8"))
        if len(r) >= 6
    ]
    n = exact = tok_match = tok_total = 0
    for r in rows:
        ours, _ = gp(r[4])
        n += 1
        a, b = ours.split(), r[5].split()
        m = sum(x == y for x, y in zip(a, b))
        tok_match += m
        tok_total += max(len(a), len(b))
        exact += ours == r[5]
    assert exact == n, f"exact {exact}/{n}"
    assert tok_match == tok_total, f"tokens {tok_match}/{tok_total}"
