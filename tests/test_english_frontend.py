"""Legacy English frontend: cleaners, number verbalization, CMUdict."""

import io

from tacotronv2_wavernn_chinese_tpu.frontend import english as E


def test_number_to_words():
    assert E.number_to_words(0) == "zero"
    assert E.number_to_words(17) == "seventeen"
    assert E.number_to_words(42) == "forty two"
    assert E.number_to_words(100) == "one hundred"
    assert E.number_to_words(1234) == "one thousand two hundred thirty four"
    assert E.number_to_words(1000000) == "one million"
    assert E.number_to_words(-5) == "minus five"


def test_normalize_numbers():
    assert E.normalize_numbers("I have 2 cats") == "I have two cats"
    assert E.normalize_numbers("1,234 items") == "one thousand two hundred thirty four items"
    assert E.normalize_numbers("$5.50 please") == "five dollars, fifty cents please"
    assert E.normalize_numbers("£20 note") == "twenty pounds note"
    # decimal part reads as a whole number (keithito convention, numbers.py)
    assert E.normalize_numbers("3.14 pie") == "three point fourteen pie"
    assert E.normalize_numbers("the 3rd time") == "the third time"
    assert E.normalize_numbers("the 22nd") == "the twenty second"
    assert E.normalize_numbers("the 20th") == "the twentieth"


def test_english_cleaners():
    out = E.english_cleaners("Dr. Smith paid $5 on Jan 3rd,  naïve  café!")
    assert "doctor smith" in out
    assert "five dollars" in out
    assert "third" in out
    assert "naive" in out and "cafe" in out
    assert "  " not in out


def test_basic_and_transliteration_cleaners():
    assert E.basic_cleaners("  Hello   WORLD ") == "hello world"
    assert E.transliteration_cleaners("Müller") == "muller"


def test_cmudict_parsing():
    data = io.StringIO(
        "HELLO  HH AH0 L OW1\n"
        "HELLO(1)  HH EH0 L OW1\n"
        ";;; comment line\n"
        "BAD  XX YY\n"  # invalid phonemes -> dropped
        "WORLD  W ER1 L D\n"
    )
    d = E.CMUDict(data)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("WORLD") == ["W ER1 L D"]
    assert d.lookup("bad") is None

    data.seek(0)
    d2 = E.CMUDict(data, keep_ambiguous=False)
    assert d2.lookup("hello") is None  # ambiguous entries dropped
    assert d2.lookup("world") == ["W ER1 L D"]
