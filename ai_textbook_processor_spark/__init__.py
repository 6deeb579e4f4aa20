"""ai_textbook_processor_spark — a PySpark-native main-content extraction engine.

Built from scratch with the extraction capabilities of the reference repo
``devrishiutl/ai-textbook-processor`` (a FastAPI + LangGraph service that
outsources extraction to OCR/LLM services), re-expressed as an idiomatic
Spark batch pipeline over interleaved-document tables:

* HTML boilerplate stripping via Arc90/readability-style text-density and
  link-density scoring (replaces the reference's raw Serper scrape +
  LLM consumption, ``config/configuration.py:145-165``).
* Rule-based PDF layout segmentation: reading-order sort by
  (page, column, y, x), heading/body/caption classification from per-page
  font-size histograms (replaces Mistral OCR,
  ``utils/text_extract_MistralAI.py:24-37``).
* Interleaved media-span stitching: figure/table refs re-anchored into the
  extracted text stream by source offset (mirrors OCR markdown keeping
  figure refs in-stream, ``utils/text_extract_MistralAI.py:29-37``).
* Deterministic readability validation (Flesch-Kincaid + type-token ratio +
  lexicon safety), replacing the LLM validator (``agents/nodes.py:229-270``).
* Keyed persistence with metadata + per-partition lineage and
  checkpoint-resume (replaces ChromaDB, ``utils/chroma_utility.py:9-44``,
  and the SSE progress stream, ``routes/route.py:205-268``).

All hot-path logic runs in vectorized pandas/Arrow UDFs over span arrays —
no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
