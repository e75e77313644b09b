"""Output-format templates (reference -x: build_output_format
swish_xapian.cpp:786-858 + swish_get_C_escaped_char string.c:992)."""

import pytest

from swishray.outputformat import (parse_output_format,
                                   render_output_format)


def test_parse_pieces():
    assert parse_output_format('<swishrank> "<t>"\\n') == [
        ("prop", "swishrank"), ("lit", ' "'), ("prop", "t"),
        ("lit", '"\n')]
    # reference skips whitespace after < and ends at > OR whitespace;
    # a space terminator consumes only itself, so a following '>' is
    # literal (faithful to swish_xapian.cpp:818-827)
    assert parse_output_format("< swishdocpath>") == [
        ("prop", "swishdocpath")]
    assert parse_output_format("< swishdocpath >") == [
        ("prop", "swishdocpath"), ("lit", ">")]


def test_c_escapes():
    got = parse_output_format(r"a\tb\x41\07c\\d\q")
    assert got == [("lit", "a\tbA\x07c\\dq")]
    # trailing backslash stays literal (the reference's '\0 after \\'
    # branch)
    assert parse_output_format("x\\") == [("lit", "x\\")]


def test_unterminated_placeholder_croaks():
    with pytest.raises(ValueError):
        parse_output_format("<swishrank")


def test_render_builtin_and_stored_props():
    rows = [{"key": "/a.html", "score": 7, "title": "Alpha"},
            {"key": "/b.html", "score": 3}]
    out = render_output_format(
        rows, '<swishrank> <swishdocpath> "<title>"\\n')
    assert out == '7 /a.html "Alpha"\n3 /b.html ""\n'


def test_render_default_template():
    out = render_output_format([{"key": "k", "score": 1}])
    assert out == '1 k ""\n'


def test_render_lastmodified_time_format():
    import time
    out = render_output_format(
        [{"key": "k", "score": 1, "swishlastmodified": 0}],
        "<swishlastmodified>")
    assert out == time.strftime("%Y-%m-%d %H:%M:%S %Z",
                                time.localtime(0))
