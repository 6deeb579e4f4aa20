"""Fast HTML tokenizer == stdlib HTMLParser, extraction-output equality.

The fast path (kernels._fast_feed) drives the same _DomBuilder handlers;
anything it can't tokenize with certainty bails to stdlib for the whole
fragment. These tests pin output equality on every corpus family, on
targeted nasty fragments (including the deliberate bail cases), and on
derandomized fuzz — so the speedup can never drift the pinned semantics.

A one-off 25,000-case campaign (random compositions of 40+ HTML
constructs incl. raw-text elements, comments, CDATA, bogus brackets, and
pure unicode soup) found zero divergences (r2, 2026-08-16)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_textbook_processor_spark.corpus import ALL_FAMILIES, gen_doc
from ai_textbook_processor_spark.functions import kernels as K


def _both(html: str):
    old = K._HTML_PARSER_MODE
    try:
        K._HTML_PARSER_MODE = "fast"
        fast = K.extract_html_fragment(html)
        K._HTML_PARSER_MODE = "stdlib"
        std = K.extract_html_fragment(html)
    finally:
        K._HTML_PARSER_MODE = old
    return fast, std


def _doc_both(spans):
    old = K._HTML_PARSER_MODE
    try:
        K._HTML_PARSER_MODE = "fast"
        fast = K.extract_document(spans)
        K._HTML_PARSER_MODE = "stdlib"
        std = K.extract_document(spans)
    finally:
        K._HTML_PARSER_MODE = old
    return fast, std


def test_equal_on_every_family():
    for fam in ALL_FAMILIES:
        for idx in range(0, 48, 3):
            d = gen_doc(idx, 42, family=fam)
            fast, std = _doc_both(d["spans"])
            assert fast == std, (fam, idx)


NASTY = [
    "<p>a &amp; b &#65; &nbsp; &notareal; &lt tag</p>",
    "<P CLASS='X'>UPPER <B>bold</B></P>",
    '<div title="a > b"><p>quoted gt in attr stays one tag</p></div>',
    "<script>if (a<b) { document.write('<div>not a tag</div>'); }</script><p>after script</p>",
    "<style>p > a { color: red }</style><p>after style</p>",
    "<!-- <p>commented out</p> --><p>real</p>",
    "<p>unclosed paragraph<p>second implies close of first</p>",
    "<ul><li>one<li>two<li>three</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<p>line<br/>break<br>twice</p>",
    "<p>stray < bracket and 1<2 math</p>",            # bogus '<' -> bail path
    "<![CDATA[ raw <p>stuff</p> ]]><p>after cdata</p>",  # bail path
    "</p class='x'><p>endtag with attrs</p>",            # bail path
    "<a@weird>link-ish</a@weird><p>tag-name edge</p>",   # bail path
    "<?php echo '<p>pi</p>'; ?><p>after pi</p>",
    "<!DOCTYPE html><html><body><p>doc</p></body></html>",
    "<div><p>outer <a href='/x'>link text</a> tail</p></div>",
    "<p>entity without semicolon &amp here</p>",
    "<p>é café &eacute; 中文</p>",
    "",
    "plain text, no tags at all, long enough to be a body block maybe",
    "<p>" + "x" * 5000 + "</p>",
    "<script>never closed <p>rest swallowed",            # bail: unclosed raw
    "<!-- never closed comment <p>gone",                 # bail: unclosed comment
    # --- r3 ADVICE regressions: raw-text close must be a FULL '</\s*name\s*>'
    "<p>pre</p><script>a</scripty>x</script><p>post</p>",   # prefix-only close is data
    "<p>pre</p><script>a</ script><p>leak?</p>",             # '</ script' IS a close (stdlib \s*)
    "<script>a</script ><p>after</p>",                       # ws before '>' in close
    "<script>a</SCRIPT><p>case-insensitive close</p>",
    "<style>p{}</styleX>q</style><p>after</p>",
    # --- r3 ADVICE regressions: trailing '/' classification
    "<p>go <a href=http://x.com/>link</a> tail</p>",     # '/' swallowed into unquoted value -> start tag
    "<p>go <a href=http://x.com/ >link</a> tail</p>",    # '/ >' never self-closing
    '<p>go <a href="http://x.com/">quoted</a> t</p>',
    "<p><input disabled/>bare-name self-close</p>",
    "<p><br //>double slash</p>",                        # bail (stdlib: startend)
    "<p><a foo=a\"b\"/>quote-in-unquoted-value</a>x</p>",  # bail
    "<p><a foo=bar/ baz=q>mid junk</a>y</p>",
    "<p><a href=x/>v</a><a href=x />w</a><a href=x/ >z</a></p>",
    # --- r4 ADVICE regressions: raw-text tag whose trailing '/' is part of
    # an unquoted attribute value must STILL enter cdata mode (stdlib calls
    # set_cdata_mode on every script/style handle_starttag). Pre-fix, the
    # VALTAIL branch skipped the raw-text scan, so markup inside the script
    # body closed ancestor elements early.
    '<div><p>keep me here with enough text to score</p>'
    '<script src=http://x.com/>document.write("</div><div>")</script>'
    '<p>tail paragraph with plenty of words in it</p></div>',
    "<div><style media=screen/x/>p{color:red}</style><p>body text here</p></div>",
    '<script src=http://x.com/>var a="</scripty>";</script><p>after</p>',
    "<script src=http://x.com/>no close tag at all",      # bail: unclosed raw
    "<script src=http://x.com//>self-close-ish value</script><p>t</p>",
    "<style type=text/css/>q{}</style><p>after</p>",
]


# Composition grammar for the differential fuzzer: random concatenations of
# realistic constructs, now including the r4 raw-text VALTAIL variants.
_GRAMMAR_PIECES = [
    "<p>plain text</p>",
    "<div>",
    "</div>",
    "<script>x<y; document.write('</div>');</script>",
    "<script src=http://x.com/>w('</div>')</script>",
    "<style media=all/>p{}</style>",
    "<style>p>a{}</style>",
    "<a href=http://x.com/>link</a>",
    "<a href=x/>v</a>",
    "<input disabled/>",
    "<br //>",
    "<!-- c -->",
    "<![CDATA[z]]>",
    "<?pi?>",
    "&amp; &#65; &bad;",
    "text < soup",
    "</script>",
    "<script src=http://x.com/>",
    "é中",
]


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(st.sampled_from(_GRAMMAR_PIECES), min_size=0, max_size=8))
def test_equal_on_grammar_compositions(pieces):
    html = "".join(pieces)
    fast, std = _both(html)
    assert fast == std, repr(html)


def test_valtail_rawtext_dom_structure_matches_stdlib():
    """DOM-level (not just span-level) equality for the r4 fix: the VALTAIL
    start tag of a raw-text element must consume its body as cdata, so the
    '</div>' inside the script body must NOT close the outer div."""
    html = (
        '<div><p>keep</p><script src=http://x.com/>w("</div>")</script>'
        "<p>tail</p></div>"
    )
    b = K._DomBuilder()
    K._fast_feed(b, html)  # fast path must handle it (no bail)

    def shape(n):
        return [
            (c.tag, shape(c)) if isinstance(c, K._Node) else ("#t", c)
            for c in n.content
        ]

    sb = K._DomBuilder()
    sb.feed(html)
    sb.close()
    assert shape(b.root) == shape(sb.root)
    # both <p> children must still be INSIDE the div
    div = next(c for c in b.root.content if isinstance(c, K._Node))
    tags = [c.tag for c in div.content if isinstance(c, K._Node)]
    assert tags == ["p", "script", "p"]


def test_equal_on_nasty_fragments():
    for html in NASTY:
        fast, std = _both(html)
        assert fast == std, html


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    st.text(
        alphabet=st.sampled_from(
            list("<>/&;#abcdep!?-=\"' \né中")
        ),
        max_size=200,
    )
)
def test_equal_on_fuzzed_html(s):
    fast, std = _both(s)
    assert fast == std, repr(s)


def test_fast_path_actually_taken_on_clean_html():
    """The clean-article fragment must parse via the fast tokenizer (no
    bail) — guard against a regression that silently routes everything to
    stdlib and loses the speedup."""
    d = gen_doc(0, 42, family="html_article")
    html = d["spans"][0]["text"]
    b = K._DomBuilder()
    K._fast_feed(b, html)  # must not raise _FastBail
    # and the tree it builds extracts identically
    fast, std = _both(html)
    assert fast == std and len(fast) > 0
