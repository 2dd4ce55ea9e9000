"""Ingestion sources — the reference's parser layer re-expressed as
vectorized DataFrame transforms (SURVEY.md §2.1).

Every parser here is a pure column-to-rows transform: one document
column in, typed (possibly exploded) rows out, built from
`from_xml` / `from_json` / regexp + higher-order functions — JVM-side
and whole-stage-codegen-friendly, no row-at-a-time Python.

Modules:
  xmlsrc      OCLC Classify / VIAF-style XML (S3)
  jsonld      JSON-LD @graph documents, the `ldq` family (S4)
  marc        MARC-in-JSON varFields routing (S7)
  ntriples    N-Triples line scan (S6)
  htmlsrc     HTML table scrape (S5)
  opds        OPDS/Atom feed entries (S8)
  http_cache  cached-fetch pattern: TTL'd cache table + anti-join +
              batched fetch (S1)
"""
