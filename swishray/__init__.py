"""swishray — a Ray-Data-native document analysis / extraction engine.

Re-expresses the capabilities of karpet/libswish3 (a libxml2-SAX
HTML/XML/TXT document analyzer) as Ray Data pipelines: Parquet tables
of web pages in, per-document extraction records (metanames,
properties, token lists, docinfo) out, at cluster scale.

Layout (SURVEY.md §7.1):
  config.py     declarative extraction config (swish.xml semantics)
  mime.py       ext->MIME->parser resolution
  text.py       byte/str scalar helpers with glibc-exact semantics
  tokenizer.py  position-annotated word tokenizer (tokenizer.c parity)
  sax.py        tag-event state machine: bake_tag, stacks, buffers
  libxml.py     ctypes bindings to system libxml2 (same library the
                reference uses -> identical parse trees)
  extractor.py  per-document driver: sniff -> decode -> parse -> record
  pipeline.py   Ray Data graphs (read_parquet -> map_batches -> sink)
  synth.py      deterministic synthetic web-page table generator
  ops/          generic large-scale table operators (dedup, text
                analysis, similarity search, multimodal stubs)
"""

__version__ = "0.1.0"
