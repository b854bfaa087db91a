"""Corpus adapters: external table shapes -> the engine's Document dict.

Three input shapes (FIXTURES.md §1-3):

* ``corpus_code`` — the graft input per BASELINE.json's input_hint:
  ``(repo, path, commit, lang, content)``;
* ``documents`` — the driver-provided table at
  /root/testdata/sf*/documents.parquet:
  ``(doc_id, text, lang, source, n_chars)``;
* ``corpus_md`` — raw Markdown + YAML frontmatter, the reference's own
  on-disk format (``Document::parse_file``,
  /root/reference/src/document.rs:123-160).

All adapters are deterministic pure functions of the row so the same
mapping runs in the pure-Python oracle and inside Spark pandas UDFs.
The engine's Document dict keys: doc_id, fullpath, title, subtitle,
authors (list), date (epoch int), tags (list), weight, writes, views,
body — mirroring the reference struct (src/document.rs:69-109).
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

from .dates import parse_date


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def doc_from_documents_row(doc_id: int, text: str, lang: str,
                           source: str) -> dict:
    """driver ``documents`` table -> Document (TESTDATA.md / FIXTURES.md §3).

    doc_id is made 1-based (Xapian docids start at 1; ascending-docid
    tie-break parity).  title/date are deterministic derivations so
    field-scoped and date-range queries are exercisable.

    The title split is pinned to Java-regex-default ``\\s`` = ASCII
    ``[ \\t\\n\\x0b\\f\\r]`` so this twin and the native-expression
    adapter (ingest.docs_from_documents_table, which runs Java regexes)
    agree on EVERY input — Python ``str.split()`` would also split on
    Unicode whitespace like U+00A0 and diverge (ADVICE r03).
    """
    text = text or ""
    words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", text) if w]
    return {
        "doc_id": int(doc_id) + 1,
        "fullpath": f"{source}/{int(doc_id)}.md",
        "title": " ".join(words[:4]),
        "subtitle": "",
        "authors": [source],
        "date": 1600000000 + int(doc_id) * 3600,
        "tags": [lang] if lang else [],
        "weight": 0,
        "writes": 0,
        "views": 0,
        "body": text,
        "sha256": sha256_hex(text),
    }


def cjk_translit(text: str, limit: int = 60) -> str:
    """Deterministic ASCII->CJK transliteration of a text prefix: each
    of the first ``limit`` chars maps to a CJK Unified Ideograph
    (U+4E00 + ord(c) % 500 — always category Lo, always inside
    CJK::codepoint_is_cjk).  Used to synthesize CJK content from the
    driver's ASCII ``documents`` corpus so the FLAG_CJK_NGRAM path can
    be exercised in the DuckDB correctness gate without external data
    (spaces map to a CJK char too, so one window = one unbroken run)."""
    return "".join(chr(0x4E00 + ord(c) % 500) for c in text[:limit])


def cjk_augment(text: str) -> str:
    """Corpus transform for the CJK gate entries: the original text plus
    a transliterated copy of its first 60 chars on a new line.  Applied
    identically by the Spark ingest (entry_queries.ensure_cjk_index)
    and the pure-Python term-rows export (xq_oracle.ensure_termrows
    with cjk=True), so both sides index the exact same string."""
    text = text or ""
    return text + "\n" + cjk_translit(text)


def doc_from_code_row(doc_id: int, repo: str, path: str, commit: str,
                      lang: str, content: str) -> dict:
    """corpus_code (input_hint shape) -> Document.

    ``fullpath = repo + '/' + path``, ``body = content`` (SURVEY.md §1.4);
    the commit drives a deterministic pseudo-date so date predicates are
    testable without external data.
    """
    content = content or ""
    basename = (path or "").rsplit("/", 1)[-1]
    try:
        commit_num = int((commit or "0")[:8], 16)
    except ValueError:
        commit_num = 0
    return {
        "doc_id": int(doc_id),
        "fullpath": f"{repo}/{path}",
        "title": basename,
        "subtitle": "",
        "authors": [repo] if repo else [],
        "date": 1577836800 + (commit_num % (86400 * 1000)),
        "tags": [lang] if lang else [],
        "weight": 0,
        "writes": 0,
        "views": 0,
        "body": content,
        "sha256": sha256_hex(content),
    }


# ---------------------------------------------------------------------------
# Markdown + YAML frontmatter (corpus_md, the reference's native format)
# ---------------------------------------------------------------------------

_FM_RE = re.compile(r"\A---\s*\n(.*?)\n---\s*\n?", re.DOTALL)


class FrontmatterError(ValueError):
    """File without parseable frontmatter — the reference logs and skips
    these (src/main.rs:101-106, src/document.rs:155-158)."""


def _parse_yaml_subset(block: str) -> dict:
    """Tiny YAML-subset parser for frontmatter: ``key: value`` scalars,
    inline lists ``[a, b]``, and block lists (``- item`` lines).  This is
    the subset the reference's own README documents (README.md:86-102);
    full YAML is out of scope by design."""
    out: dict = {}
    key = None
    for raw in block.split("\n"):
        line = raw.rstrip()
        if not line.strip() or line.strip().startswith("#"):
            continue
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*:\s*(.*)$", line)
        if m and not line.startswith((" ", "\t", "-")):
            key, val = m.group(1), m.group(2).strip()
            if val == "":
                out[key] = []  # likely a block list follows
            elif val.startswith("[") and val.endswith("]"):
                inner = val[1:-1].strip()
                out[key] = [
                    v.strip().strip("'\"")
                    for v in inner.split(",") if v.strip()
                ] if inner else []
            else:
                out[key] = val.strip("'\"")
            continue
        m = re.match(r"^\s*-\s*(.*)$", line)
        if m and key is not None:
            if not isinstance(out.get(key), list):
                out[key] = []
            out[key].append(m.group(1).strip().strip("'\""))
            continue
    return out


def _coerce_list(value) -> list:
    """Scalar-or-list coercion (src/document.rs:193-232)."""
    if value is None:
        return []
    if isinstance(value, list):
        return [str(v) for v in value]
    return [str(value)]


def doc_from_markdown(doc_id: int, fullpath: str, raw: str) -> dict:
    """Parse one Markdown+frontmatter file (Document::parse_file,
    src/document.rs:123-160).  Raises FrontmatterError when the leading
    ``---`` block is absent — callers skip such files like the reference.

    Field aliases honored: ``author`` -> authors, ``tag`` -> tags
    (src/document.rs:83,92).  ``title`` is required (src/document.rs:101).
    """
    m = _FM_RE.match(raw or "")
    if not m:
        raise FrontmatterError(f"Failed to process file {fullpath}")
    fm = _parse_yaml_subset(m.group(1))
    body = raw[m.end():]
    if "title" not in fm:
        raise FrontmatterError(f"missing title in {fullpath}")
    authors = _coerce_list(fm.get("authors", fm.get("author")))
    tags = _coerce_list(fm.get("tags", fm.get("tag")))
    date = parse_date(fm.get("date")) or 0

    def _int(v, default=0):
        try:
            return int(v)
        except (TypeError, ValueError):
            return default

    # deterministic id: the reference assigns a random UUID when absent
    # (src/document.rs:148-151); we derive it from the fullpath so
    # re-indexing is reproducible (SURVEY.md S2: uuid5-style determinism)
    doc_uuid = fm.get("id") or hashlib.sha1(
        fullpath.encode("utf-8")).hexdigest()[:22]
    return {
        "doc_id": int(doc_id),
        "id": doc_uuid,
        "fullpath": fullpath,
        "title": str(fm.get("title", "")),
        "subtitle": str(fm.get("subtitle", "")),
        "authors": authors,
        "date": date,
        "tags": tags,
        "weight": _int(fm.get("weight")),
        "writes": _int(fm.get("writes")),
        "views": _int(fm.get("views")),
        "body": body,
        "sha256": sha256_hex(raw or ""),
    }
