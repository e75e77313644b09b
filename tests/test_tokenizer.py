"""Tokenizer conformance vectors (src/t/005-tokenizer.t + the perl
binding position assertions, FIXTURES.md §3)."""

from swishray.tokenizer import TokenList, tokenize_into


def toks(data: bytes):
    tl = TokenList()
    tokenize_into(tl, data, "swishdefault", "swishdefault")
    return tl


def values(data: bytes):
    return [v.decode("utf-8", "replace") for v in toks(data).values]


def test_simple_word():
    tl = toks(b"foobar")
    assert tl.values == [b"foobar"]
    assert tl.positions == [1]
    assert tl.offsets == [0]


def test_strip_plusplus():
    # t/005: '++foo++' -> one token 'foo' len 3
    assert values(b"++foo++") == ["foo"]


def test_cjk_single_token():
    # t/005: a CJK run is one word
    assert len(values("布朗在迅速跳下懒狐狗".encode())) == 1


def test_spanish_nine_tokens():
    s = "el zorro marrón rápido saltó sobre el perro perezoso"
    assert len(values(s.encode())) == 9


def test_url_three_tokens_lowercased():
    assert values(b"http://FOOBAR.COM/") == ["http", "foobar", "com"]


def test_positions_now_time_be():
    # bindings/perl/t/10tokenize.t: now=1, time=4, be=12; ain't is one token
    tl = toks(b"now is the time, ain't it? or when else might it be!")
    byval = dict(zip((v.decode() for v in tl.values), tl.positions))
    assert byval["now"] == 1
    assert byval["time"] == 4
    assert byval["be"] == 12
    assert b"ain't" in tl.values


def test_bumper_bumps_without_token():
    tl = toks(b"a\x03b")
    assert [v.decode() for v in tl.values] == ["a", "b"]
    assert tl.positions == [1, 3]  # \x03 consumed position 2


def test_consecutive_bumpers():
    tl = toks(b"\x03\x03x")
    assert tl.positions == [3]


def test_offsets_are_arena_offsets():
    tl = toks(b"aa bbb c")
    # arena: 'aa\0bbb\0c\0'
    assert tl.offsets == [0, 3, 7]


def test_positions_continue_across_calls():
    tl = TokenList()
    tokenize_into(tl, b"one two", "m", "c")
    tokenize_into(tl, b"three", "m", "c")
    assert tl.positions == [1, 2, 3]


def test_single_quote_at_end_unstripped():
    # tokenizer.c:795-800 one-char special case: no strip
    tl = toks(b"x '")
    assert tl.values == [b"x", b"'"]


def test_max_word_len_ascii_chunks():
    tl = toks(b"A" * 600)
    assert [len(v) for v in tl.values] == [256, 256, 88]


def test_utf8_quirky_leading_strip():
    # the strip_utf8_chrs pointer quirk: '__const' in a non-ASCII
    # buffer becomes '__co' (verified against the reference binary)
    tl = toks("é __const x".encode())
    assert b"__co" in tl.values
