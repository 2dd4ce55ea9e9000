"""Scalar function library (SURVEY.md §2.8) — the reference's
string/name/url/binary munging re-expressed as pure Column
expressions (JVM-side, codegen-friendly; no Python UDF in any of
them).

Modules:
  names      sort-name ↔ display-name munging, primary-author
             extraction, title-safe strip, accent stripping (F4, F6,
             F8)
  roles      OCLC role vocabulary mapping + the stateful multi-author
             split (F2, F3)
  urls       table-driven URL classification (F10)
  binary     binary prefix tests, base64 (F12, F14)
  canonical  coalesce priority cascade + shortest-candidate
             preference (W5)
"""
