"""E3 stitch_media: the bisect anchor lookup must be exactly equivalent to
the linear rescan it replaced (including NON-monotonic source offsets from
reading-order resorts), and a media-heavy mega doc (1000 media spans) must
stitch without quadratic blow-up (VERDICT r1 #5/#6)."""

import random
import time

from ai_textbook_processor_spark.functions.kernels import norm_text, stitch_media


def _naive(text_spans, media_spans):
    """The r1 linear-rescan semantics, verbatim (reference implementation)."""
    inserts = [[] for _ in range(len(text_spans) + 1)]
    for kind, caption, ref, anchor in media_spans:
        pos = -1
        for i, (_k, _t, src) in enumerate(text_spans):
            if src <= anchor:
                pos = i
        out_kind = "table" if kind in ("table_image", "table") else "figure"
        inserts[pos + 1].append((out_kind, norm_text(caption), ref))
    merged = list(inserts[0])
    for i, (kind, text, _src) in enumerate(text_spans):
        merged.append((kind, text, ""))
        merged.extend(inserts[i + 1])
    out, off = [], 0
    for kind, text, ref in merged:
        out.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += len(text) + 1
    return out


def test_bisect_equals_linear_rescan_nonmonotonic():
    rng = random.Random(7)
    for trial in range(25):
        n_text = rng.randint(0, 30)
        # deliberately scrambled source offsets (reading-order resort)
        srcs = rng.sample(range(0, 500), n_text)
        text_spans = [(
            rng.choice(["heading", "body"]), f"t{trial}x{i}", srcs[i]
        ) for i in range(n_text)]
        media_spans = [(
            rng.choice(["figure", "table_image"]), f"cap {j}", f"m{j}",
            rng.randint(-10, 520),
        ) for j in range(rng.randint(0, 12))]
        assert stitch_media(text_spans, media_spans) == _naive(
            text_spans, media_spans
        ), (text_spans, media_spans)


def test_mega_doc_thousand_media_spans_not_quadratic():
    n_text, n_media = 20_000, 1_000
    text_spans = [("body", f"paragraph {i}", i * 10) for i in range(n_text)]
    media_spans = [
        ("figure", f"caption {j}", f"img-{j}", j * 190 + 5) for j in range(n_media)
    ]
    t0 = time.monotonic()
    out = stitch_media(text_spans, media_spans)
    wall = time.monotonic() - t0
    assert len(out) == n_text + n_media
    # O((T+M) log T) finishes in well under a second; the old O(T*M) scan
    # was 20M comparisons for this fixture
    assert wall < 1.0, f"stitch took {wall:.2f}s — quadratic regression?"
    assert out == _naive(text_spans, media_spans)
