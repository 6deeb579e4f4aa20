"""html_with_media family: E1 (boilerplate strip) x E3 (media stitch) in one
document. Pure-kernel tests — media conservation, interleaving order, and
boilerplate exclusion — over the deterministic generator."""

from ai_textbook_processor_spark.corpus import gen_doc
from ai_textbook_processor_spark.functions.kernels import extract_document

MEDIA = {"figure", "table"}


def _docs(n=24, seed=42):
    return [gen_doc(i, seed, family="html_with_media") for i in range(n)]


def test_media_conservation_and_kinds():
    for d in _docs():
        n_media_in = sum(1 for s in d["spans"] if s["kind"] in ("figure", "table_image"))
        out = extract_document(d["spans"])
        out_media = [s for s in out if s["kind"] in MEDIA]
        assert len(out_media) == n_media_in, d["doc_id"]
        # table_image normalizes to 'table', figure stays 'figure'
        assert all(s["media_ref"].startswith("img-") for s in out_media)


def test_interleaving_follows_anchors():
    """Media anchored between fragment j and j+1 must land after the last
    text span of fragment j and before the first of fragment j+1 (html
    units inherit their source span's offset)."""
    for d in _docs():
        html_offsets = sorted(s["offset"] for s in d["spans"] if s["kind"] == "html")
        anchors = {
            s["media_ref"]: s["offset"]
            for s in d["spans"]
            if s["kind"] in ("figure", "table_image")
        }
        out = extract_document(d["spans"])
        # reconstruct which fragment each output text span came from: text
        # spans appear in fragment order, so count fragment boundaries via
        # position of media spans relative to them
        frag_of_media = {}
        frag = -1  # index into html_offsets of the last fragment started
        seen_text = 0
        for s in out:
            if s["kind"] in MEDIA:
                frag_of_media[s["media_ref"]] = frag
            else:
                if seen_text == 0 or s["kind"] == "heading":
                    # each fragment starts with its h2 -> heading span
                    if s["kind"] == "heading":
                        frag += 1
                seen_text += 1
        for ref, anchor in anchors.items():
            # expected fragment = last fragment whose source offset <= anchor
            exp = max(
                (i for i, off in enumerate(html_offsets) if off <= anchor),
                default=-1,
            )
            assert frag_of_media[ref] == exp, (d["doc_id"], ref, anchor)


def test_boilerplate_stripped():
    for d in _docs():
        out = extract_document(d["spans"])
        text = " ".join(s["text"] for s in out if s["kind"] not in MEDIA)
        assert "sitemap" not in text and "privacy" not in text  # footer gone
        # article content survives: every doc has at least one heading+body
        kinds = {s["kind"] for s in out}
        assert "body" in kinds and "heading" in kinds


def test_offsets_cumulative():
    for d in _docs(8):
        out = extract_document(d["spans"])
        off = 0
        for s in out:
            assert s["offset"] == off
            off += len(s["text"]) + 1
