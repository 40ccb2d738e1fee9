"""WARC source: read ISO 28500 WARC files into the extraction pipeline.

A web-scale corpus arrives as WARC (the CommonCrawl container), not as
parquet: concatenated records, each a CRLF header block (WARC-Type,
WARC-Target-URI, WARC-Date, Content-Length) followed by exactly
Content-Length payload bytes and a blank-line separator.  This module
provides

* :func:`encode_warc` — a writer producing spec-shaped WARC/1.0 bytes
  (warcinfo head record + one response record per page, HTTP response
  framing inside the payload), used by fixtures/tests and as the
  round-trip oracle;
* :func:`parse_warc` — a tolerant streaming parser: walks records by
  Content-Length, skips non-response records (warcinfo, request,
  metadata), and on corrupt framing resynchronizes at the next
  ``WARC/1.0`` magic instead of failing the task (the engine's
  corrupt-input contract: failures are ROWS, not exceptions);
* :func:`read_warc` — the Spark source: ``spark.read.format
  ("binaryFile")`` over a directory of ``.warc`` files, then an
  Arrow-batched ``mapInPandas`` record splitter emitting the engine's
  input schema (url, warc_ts, html).

Plan shape at 100 TB: binaryFile gives one input split per WARC file
(CommonCrawl shards are ~1 GB — the natural task granularity); the
splitter is a per-file batch kernel with bounded memory (one file's
records), and everything downstream is the ordinary extraction plan.
Reference parity: the reference engine reads PDFs from a local
filesystem walk (pdftotext++.cpp main); the WARC path is this repo's
crawl-native ingestion form of the same S1 source surface.
"""

from __future__ import annotations

import datetime
from typing import Iterable, List, Tuple

_CRLF = b"\r\n"
_MAGIC = b"WARC/1.0\r\n"


def _http_wrap(payload: bytes) -> bytes:
    head = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: application/octet-stream\r\n"
            b"Content-Length: " + str(len(payload)).encode() + _CRLF + _CRLF)
    return head + payload


def _record(headers: List[Tuple[str, str]], block: bytes) -> bytes:
    out = [_MAGIC]
    for k, v in headers:
        # CR/LF in a header VALUE would split the line and corrupt the
        # record's framing (the tolerant parser would then silently DROP
        # the record); the WARC spec forbids control characters in header
        # values, so sanitize deterministically — a no-op for legal values
        v = v.replace("\r", " ").replace("\n", " ")
        out.append(f"{k}: {v}\r\n".encode())
    out.append(b"Content-Length: " + str(len(block)).encode() + _CRLF)
    out.append(_CRLF)
    out.append(block)
    out.append(_CRLF + _CRLF)
    return b"".join(out)


def encode_warc(records: Iterable[Tuple[str, datetime.datetime, bytes]],
                filename: str = "fixture.warc") -> bytes:
    """Serialize (url, timestamp, payload) triples as one WARC file."""
    info_block = b"software: pdftotext_plus_plus_spark\r\n"
    parts = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", "2024-01-01T00:00:00Z"),
         ("WARC-Filename", filename),
         ("Content-Type", "application/warc-fields")], info_block)]
    for i, (url, ts, payload) in enumerate(records):
        http = _http_wrap(payload)
        parts.append(_record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", url),
             ("WARC-Date", ts.strftime("%Y-%m-%dT%H:%M:%SZ")),
             ("WARC-Record-ID",
              "<urn:fixture:%s:%d>" % (filename, i)),
             ("Content-Type", "application/http; msgtype=response")], http))
    return b"".join(parts)


def _parse_headers(blob: bytes, pos: int):
    """Parse one CRLF header block starting at pos (after the magic).
    Returns (headers dict lowercased, offset after blank line) or None."""
    end = blob.find(_CRLF + _CRLF, pos)
    if end < 0:
        return None
    headers = {}
    for line in blob[pos:end].split(_CRLF):
        if b":" not in line:
            return None
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("ascii", "replace")] = \
            v.strip().decode("utf-8", "replace")
    return headers, end + 4


def _iter_records(blob: bytes, stats: dict):
    """Lazily yield (headers, body, record_start, record_end) per
    well-framed record, accumulating corrupt resyncs in
    ``stats["corrupt"]``.  record_end covers the payload and the
    two-CRLF record separator when present, so
    blob[record_start:record_end] is a complete standalone record.

    A GENERATOR so callers can stream a shard's records without ever
    materializing them all (the 100 TB memory envelope: one shard's
    bytes + one in-flight record, not bytes + every record copy).

    Corruption accounting counts every skipped byte range: a record
    whose framing fails, leading junk before the first magic, AND
    unconsumed bytes between one record's end and the next magic."""
    pos = blob.find(_MAGIC)
    if pos < 0:
        if blob:
            stats["corrupt"] += 1
        return
    if pos > 0:
        stats["corrupt"] += 1               # junk before the first record
    while pos >= 0:
        parsed = _parse_headers(blob, pos + len(_MAGIC))
        advanced = None
        record = None
        if parsed is not None:
            headers, body_at = parsed
            try:
                clen = int(headers.get("content-length", ""))
            except ValueError:
                clen = -1
            if 0 <= clen <= len(blob) - body_at:
                body = blob[body_at:body_at + clen]
                end = body_at + clen
                if blob[end:end + 4] == _CRLF + _CRLF:
                    end += 4
                record = (headers, body, pos, end)
                advanced = end
        ok = advanced is not None
        if not ok:
            stats["corrupt"] += 1
            advanced = pos + len(_MAGIC)
        pos = blob.find(_MAGIC, advanced)
        # a gap after a WELL-FRAMED record is its own corrupt range (a
        # failed record's resync skip was already counted above)
        if ok and (pos > advanced or (pos < 0 and advanced < len(blob))):
            stats["corrupt"] += 1
        if record is not None:
            yield record


def _walk(blob: bytes):
    """Eager form of :func:`_iter_records` for small blobs/tests:
    returns ([records], n_corrupt)."""
    stats = {"corrupt": 0}
    records = list(_iter_records(blob, stats))
    return records, stats["corrupt"]


def _payload_of(body: bytes) -> bytes:
    http_at = body.find(_CRLF + _CRLF)
    return body[http_at + 4:] if http_at >= 0 else body


def parse_warc(blob: bytes):
    """Return ([(url, warc_date, payload_bytes) per response record],
    n_corrupt).

    Tolerant: non-response records are skipped; malformed framing (bad
    header line, missing/garbled Content-Length, truncated payload)
    resynchronizes at the next ``WARC/1.0`` magic.  Returns the parsed
    records plus the count of skipped corrupt byte ranges.
    """
    records, n_corrupt = _walk(blob)
    out = [(h.get("warc-target-uri", ""), h.get("warc-date", ""),
            _payload_of(body))
           for h, body, _, _ in records if h.get("warc-type") == "response"]
    return out, n_corrupt


def index_warc(blob: bytes):
    """CDX-style index entries: [(url, warc_date, offset, length)] per
    response record, where blob[offset:offset+length] is the complete
    standalone record — the random-access contract a CDX index exists
    for (fetch one page from a 1 GB shard without scanning it)."""
    records, _ = _walk(blob)
    return [(h.get("warc-target-uri", ""), h.get("warc-date", ""),
             start, end - start)
            for h, _, start, end in records
            if h.get("warc-type") == "response"]


def read_record(blob_slice: bytes) -> Tuple[str, bytes]:
    """Parse ONE record previously located via :func:`index_warc`:
    returns (url, payload).  Raises ValueError on a non-record slice."""
    records, _ = _walk(blob_slice)
    if len(records) != 1 or records[0][0].get("warc-type") != "response":
        raise ValueError("slice is not a single WARC response record")
    h, body, _, _ = records[0]
    return h.get("warc-target-uri", ""), _payload_of(body)


# output batching bounds for the shard splitter: a flushed pandas frame
# never exceeds ~these, so per-task peak memory is ONE shard's bytes plus
# O(batch) regardless of how many records the shard holds (SCALE.md
# §Webtext documents the full envelope)
WARC_SPLIT_BATCH_ROWS = 1024
WARC_SPLIT_BATCH_BYTES = 64 << 20


def split_warc_batches(batches, max_rows: int = None, max_bytes: int = None):
    """The shard-splitter kernel behind :func:`read_warc` (module-level so
    the bounded-batch contract is directly testable): consumes binaryFile
    (path, content) pandas batches, streams each shard's response records
    via :func:`_iter_records`, and flushes an output frame whenever the
    accumulated batch reaches ``max_rows`` rows or ``max_bytes`` payload
    bytes — never holding a whole shard's records at once."""
    import pandas as pd

    max_rows = max_rows or WARC_SPLIT_BATCH_ROWS
    max_bytes = max_bytes or WARC_SPLIT_BATCH_BYTES
    urls, dates, payloads, acc_bytes = [], [], [], 0
    for pdf in batches:
        for blob in pdf["content"]:
            stats = {"corrupt": 0}
            for h, body, _, _ in _iter_records(bytes(blob), stats):
                if h.get("warc-type") != "response":
                    continue
                urls.append(h.get("warc-target-uri", ""))
                dates.append(h.get("warc-date", ""))
                payload = _payload_of(body)
                payloads.append(payload)
                acc_bytes += len(payload)
                if len(urls) >= max_rows or acc_bytes >= max_bytes:
                    yield pd.DataFrame({"url": urls, "warc_date": dates,
                                        "html": payloads})
                    urls, dates, payloads, acc_bytes = [], [], [], 0
    if urls:
        yield pd.DataFrame({"url": urls, "warc_date": dates,
                            "html": payloads})


def read_warc(spark, path: str):
    """Read a directory of .warc files into the engine's page schema.

    ``binaryFile`` yields (path, modificationTime, length, content) with
    one row per file; the splitter is an Arrow-batched kernel bounded by
    one file's bytes plus one output batch (see
    :func:`split_warc_batches`).  Dates parse to timestamps JVM-side.
    """
    from pyspark.sql import functions as F

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.warc").load(path)
           .select("path", "content"))

    pages = raw.mapInPandas(
        split_warc_batches, "url string, warc_date string, html binary")
    return pages.select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("warc_ts"),
        "html")


def shard_files(rows, n_files: int = 4):
    """Round-robin the corpus rows into named shard blobs: yields
    (filename, encoded_bytes).  The SINGLE source of truth for the
    shard layout — write_warc_dir writes exactly this, and the CDX
    oracle indexes exactly this, so they can never drift apart."""
    buckets: List[List] = [[] for _ in range(n_files)]
    for i, r in enumerate(rows):
        buckets[i % n_files].append((r["url"], r["warc_ts"], r["html"]))
    for k, recs in enumerate(buckets):
        name = "part-%02d.warc" % k
        yield name, encode_warc(recs, filename=name)


def write_warc_dir(rows, out_dir: str, n_files: int = 4) -> None:
    """Write fixture corpus rows as n_files .warc files (round-robin)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, blob in shard_files(rows, n_files):
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)


def cdx_index(spark, path: str):
    """Build a CDX-style index over a directory of .warc files: one row
    (url, warc_date, filename, offset, length) per response record.

    Plan shape at 100 TB: the same one-task-per-shard binaryFile scan as
    :func:`read_warc`; the index is ~100 bytes/page vs ~100 KB/page of
    content (a 1000x reduction BEFORE any shuffle), so the sort/partition
    that makes the index servable is over the tiny side.  Random access
    then reads blob[offset:offset+length] from the shard — fetch one
    page from a 1 GB shard without scanning it.
    """
    import os as _os

    import pandas as pd

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.warc").load(path)
           .select("path", "content"))

    def index_files(batches):
        for pdf in batches:
            urls, dates, files, offs, lens = [], [], [], [], []
            for p, blob in zip(pdf["path"], pdf["content"]):
                name = _os.path.basename(p)
                for url, date, off, ln in index_warc(bytes(blob)):
                    urls.append(url)
                    dates.append(date)
                    files.append(name)
                    offs.append(off)
                    lens.append(ln)
            yield pd.DataFrame({"url": urls, "warc_date": dates,
                                "filename": files, "offset": offs,
                                "length": lens})

    return raw.mapInPandas(
        index_files,
        "url string, warc_date string, filename string, "
        "offset long, length long")


# ---------------------------------------------------------------------------
# WET conversion records (the WARC -> extracted-text product)
# ---------------------------------------------------------------------------

# CommonCrawl publishes extraction output as WET files: the same ISO
# 28500 framing, but records are WARC-Type ``conversion`` whose block is
# the extracted plain text itself (no HTTP envelope) and whose
# WARC-Refers-To names the response record it was derived from.  The
# writer/parser pair below is the repo's WET product surface; the
# round trip is oracled against the extract_text goldens (registry query
# warc_wet_records) — the WET bytes are byte-faithful to the engine's
# extracted_text surface.

WET_DATE = "2024-01-01T00:00:00Z"     # deterministic artifact date


def encode_wet(records, filename: str = "fixture.warc.wet") -> bytes:
    """Serialize (url, text[, refers_to]) tuples as one WET file:
    warcinfo head record + one ``conversion`` record per page whose
    block is the UTF-8 extracted text.  Content-Length framing makes
    text containing the record magic safe (the body is length-counted,
    never scanned)."""
    info_block = b"software: pdftotext_plus_plus_spark\r\n"
    parts = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", WET_DATE),
         ("WARC-Filename", filename),
         ("Content-Type", "application/warc-fields")], info_block)]
    for i, rec in enumerate(records):
        url, text = rec[0], rec[1]
        refers_to = rec[2] if len(rec) > 2 else ""
        headers = [("WARC-Type", "conversion"),
                   ("WARC-Target-URI", url),
                   ("WARC-Date", WET_DATE),
                   ("WARC-Record-ID", "<urn:wet:%s:%d>" % (filename, i))]
        if refers_to:
            headers.append(("WARC-Refers-To", refers_to))
        headers.append(("Content-Type", "text/plain"))
        parts.append(_record(headers, text.encode("utf-8")))
    return b"".join(parts)


def parse_wet(blob: bytes):
    """Return ([(url, text) per conversion record], n_corrupt).  Same
    tolerant resync walk as :func:`parse_warc`; the body IS the text
    (WET records carry no HTTP envelope)."""
    records, n_corrupt = _walk(blob)
    out = [(h.get("warc-target-uri", ""), body.decode("utf-8", "replace"))
           for h, body, _, _ in records
           if h.get("warc-type") == "conversion"]
    return out, n_corrupt


def wet_convert(extracted, n_shards: int = 4):
    """(url, extracted_text) DataFrame -> one (filename, content) row per
    WET shard blob.

    Plan shape at 100 TB: ONE applyInPandas keyed on a url-hash bucket —
    each task holds one shard's text (WET is the post-extraction product,
    ~10x smaller than the WARC input), encodes it, emits one row.  Shard
    count is the parallelism knob; rows within a shard sort by url so
    shard bytes are deterministic under any upstream partitioning."""
    import pandas as pd
    from pyspark.sql import functions as F

    def build(key, pdf):
        name = "part-%02d.warc.wet" % int(key[0])
        # BOTH columns in the sort key: a duplicate url (re-crawl,
        # duplicate ingest) under a url-only unstable sort would leave
        # its rows in partition-arrival order and break the
        # deterministic-bytes contract
        pdf = pdf.sort_values(["url", "extracted_text"])
        blob = encode_wet(
            list(zip(pdf["url"], pdf["extracted_text"])), filename=name)
        return pd.DataFrame({"filename": [name], "content": [blob]})

    return (extracted
            .withColumn("bucket",
                        F.pmod(F.xxhash64("url"), F.lit(n_shards)))
            .groupBy("bucket")
            .applyInPandas(build, "filename string, content binary"))


def read_wet_blobs(shards):
    """(filename, content) WET blobs -> (url, extracted_text) rows,
    streaming each shard's records through :func:`_iter_records` with
    the same bounded flush discipline as :func:`split_warc_batches`
    (one shard's bytes + one output batch of peak memory per task)."""
    import pandas as pd

    def split(batches):
        urls, texts, acc_bytes = [], [], 0
        for pdf in batches:
            for blob in pdf["content"]:
                # stream via _iter_records (NOT the eager parse_wet,
                # which materializes every record of the shard before
                # the flush loop can run — per-task peak would be the
                # whole shard's decoded text, ADVICE r7): one record is
                # in flight at a time, so the flush bound below is real
                stats = {"corrupt": 0}
                for h, body, _, _ in _iter_records(bytes(blob), stats):
                    if h.get("warc-type") != "conversion":
                        continue
                    url = h.get("warc-target-uri", "")
                    text = body.decode("utf-8", "replace")
                    urls.append(url)
                    texts.append(text)
                    acc_bytes += len(text)
                    if (len(urls) >= WARC_SPLIT_BATCH_ROWS
                            or acc_bytes >= WARC_SPLIT_BATCH_BYTES):
                        yield pd.DataFrame(
                            {"url": urls, "extracted_text": texts})
                        urls, texts, acc_bytes = [], [], 0
        if urls:
            yield pd.DataFrame({"url": urls, "extracted_text": texts})

    return shards.mapInPandas(split, "url string, extracted_text string")


# ---------------------------------------------------------------------------
# WAT metadata records (the WARC -> per-record-metadata product)
# ---------------------------------------------------------------------------

# CommonCrawl's third file type: WAT files carry one ``metadata`` record
# per WARC record whose block is a JSON envelope describing it (header
# fields, payload digest/length, container offsets).  Together with WET
# (extracted text) this completes the WARC/WAT/WET triad.  JSON is
# serialized canonically (sorted keys, fixed separators) so WAT bytes
# are deterministic and the parse-back oracles exactly.


def wat_from_warc(name: str, blob: bytes) -> bytes:
    """Build the WAT file for one WARC shard: a warcinfo head record
    plus one ``metadata`` record per RESPONSE record, whose JSON block
    carries the envelope (original WARC headers), payload metadata
    (md5 digest + byte length of the HTTP-stripped payload) and the
    container coordinates (filename, offset, record length) — the same
    random-access contract the CDX index serves, in WAT's JSON form."""
    import hashlib
    import json

    info_block = b"software: pdftotext_plus_plus_spark\r\n"
    parts = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", WET_DATE),
         ("WARC-Filename", name + ".wat"),
         ("Content-Type", "application/warc-fields")], info_block)]
    i = 0
    # stream via the generator: the eager _walk would hold every body
    # slice at once — a second full copy of the shard's bytes on top of
    # the blob itself, breaking the one-shard + one-in-flight-record
    # memory envelope this module documents
    for h, body, start, end in _iter_records(blob, {"corrupt": 0}):
        if h.get("warc-type") != "response":
            continue
        payload = _payload_of(body)
        env = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": h.get("warc-target-uri", ""),
                    "WARC-Date": h.get("warc-date", ""),
                },
                "Payload-Metadata": {
                    "Actual-Content-Length": len(payload),
                    "Block-Digest":
                        "md5:" + hashlib.md5(payload).hexdigest(),
                },
            },
            "Container": {
                "Filename": name,
                "Offset": start,
                "Length": end - start,
            },
        }
        block = json.dumps(env, sort_keys=True,
                           separators=(",", ":")).encode("utf-8")
        parts.append(_record(
            [("WARC-Type", "metadata"),
             ("WARC-Target-URI", h.get("warc-target-uri", "")),
             ("WARC-Date", WET_DATE),
             ("WARC-Record-ID", "<urn:wat:%s:%d>" % (name, i)),
             ("Content-Type", "application/json")], block))
        i += 1
    return b"".join(parts)


def parse_wat(blob: bytes):
    """Return ([(url, warc_date, filename, offset, length, payload_digest,
    payload_len) per metadata record], n_corrupt) — the JSON envelopes
    decoded back to flat rows; malformed JSON counts as corrupt and the
    walk continues (same tolerance contract as parse_warc)."""
    import json

    records, n_corrupt = _walk(blob)
    out = []
    for h, body, _, _ in records:
        if h.get("warc-type") != "metadata":
            continue
        try:
            env = json.loads(body.decode("utf-8"))
            hdr = env["Envelope"]["WARC-Header-Metadata"]
            pay = env["Envelope"]["Payload-Metadata"]
            cont = env["Container"]
            out.append((hdr["WARC-Target-URI"], hdr["WARC-Date"],
                        cont["Filename"], int(cont["Offset"]),
                        int(cont["Length"]),
                        pay["Block-Digest"],
                        int(pay["Actual-Content-Length"])))
        except (ValueError, KeyError, TypeError):
            n_corrupt += 1
    return out, n_corrupt


def wat_index(spark, path: str):
    """The Spark WAT pipeline over a directory of .warc files: build
    each shard's WAT bytes in its own task, parse them back, and emit
    one flat row per response record.

    Plan shape at 100 TB: the same one-task-per-~1 GB-shard binaryFile
    scan as read_warc/cdx_index; the WAT product is ~200 bytes/page vs
    ~100 KB/page of content, so — like the CDX index — everything after
    the per-shard kernel is over the tiny side.  Build and parse-back
    run in ONE task so the query output proves the writer/parser pair
    round-trips, not just that the writer ran.
    """
    import os as _os

    import pandas as pd

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.warc").load(path)
           .select("path", "content"))

    def build(batches):
        for pdf in batches:
            cols = {k: [] for k in ("url", "warc_date", "filename",
                                    "offset", "length", "payload_digest",
                                    "payload_len")}
            for p, blob in zip(pdf["path"], pdf["content"]):
                name = _os.path.basename(p)
                wat = wat_from_warc(name, bytes(blob))
                rows, _ = parse_wat(wat)
                for url, date, fn, off, ln, dig, pln in rows:
                    cols["url"].append(url)
                    cols["warc_date"].append(date)
                    cols["filename"].append(fn)
                    cols["offset"].append(off)
                    cols["length"].append(ln)
                    cols["payload_digest"].append(dig)
                    cols["payload_len"].append(pln)
            yield pd.DataFrame(cols)

    return raw.mapInPandas(
        build,
        "url string, warc_date string, filename string, offset long, "
        "length long, payload_digest string, payload_len long")


# ---------------------------------------------------------------------------
# revisit records (cross-snapshot payload dedup at WARC write time)
# ---------------------------------------------------------------------------

# ISO 28500 §6.7: a crawler that re-fetches a page whose payload digest
# matches a prior capture stores a ``revisit`` record with an EMPTY block
# and a pointer to the original instead of the payload bytes — this is
# how CommonCrawl-style archives avoid storing the unchanged web twice.
REVISIT_PROFILE = ("http://netpreserve.org/warc/1.0/revisit/"
                   "identical-payload-digest")
SNAP_DATE = "2024-03-01T00:00:00Z"


def encode_snapshot_warc(rows, filename: str = "snap.warc") -> bytes:
    """Serialize one snapshot shard with dedup-journal awareness.

    ``rows``: [(url, payload_bytes, journal_digest_or_None)] — the
    journal digest is snapshot A's md5 for this url (None when A never
    captured it).  A row whose payload digest equals the journal digest
    becomes a ``revisit`` record (empty block, WARC-Profile +
    WARC-Refers-To-Target-URI + WARC-Payload-Digest); anything else —
    new url or changed payload — becomes a full ``response`` record.
    """
    import hashlib

    info_block = b"software: pdftotext_plus_plus_spark\r\n"
    parts = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", SNAP_DATE),
         ("WARC-Filename", filename),
         ("Content-Type", "application/warc-fields")], info_block)]
    for i, (url, payload, journal_digest) in enumerate(rows):
        digest = hashlib.md5(payload).hexdigest()
        if journal_digest is not None and digest == journal_digest:
            parts.append(_record(
                [("WARC-Type", "revisit"),
                 ("WARC-Target-URI", url),
                 ("WARC-Date", SNAP_DATE),
                 ("WARC-Record-ID", "<urn:revisit:%s:%d>" % (filename, i)),
                 ("WARC-Profile", REVISIT_PROFILE),
                 ("WARC-Refers-To-Target-URI", url),
                 ("WARC-Payload-Digest", "md5:" + digest),
                 ("Content-Type", "application/http; msgtype=response")],
                b""))
        else:
            parts.append(_record(
                [("WARC-Type", "response"),
                 ("WARC-Target-URI", url),
                 ("WARC-Date", SNAP_DATE),
                 ("WARC-Record-ID", "<urn:snap:%s:%d>" % (filename, i)),
                 ("WARC-Payload-Digest", "md5:" + digest),
                 ("Content-Type", "application/http; msgtype=response")],
                _http_wrap(payload)))
    return b"".join(parts)


def snapshot_warc_shards(joined, n_shards: int = 4):
    """(url, payload binary, journal_digest nullable) DataFrame -> one
    (filename, content) row per snapshot WARC shard.

    Plan shape at 100 TB: the journal comparison data arrives as a
    COLUMN (the caller's url-keyed equi-join against snapshot A's digest
    journal — hash join, AQE-splittable), so the writer kernel is one
    applyInPandas per url-hash bucket exactly like wet_convert: each
    task holds one shard's rows, sorts by url for deterministic shard
    bytes, and emits one blob."""
    import pandas as pd
    from pyspark.sql import functions as F

    def build(key, pdf):
        name = "snap-%02d.warc" % int(key[0])
        pdf = pdf.sort_values(["url"])
        rows = [(u, bytes(p), d if isinstance(d, str) else None)
                for u, p, d in zip(pdf["url"], pdf["payload"],
                                   pdf["journal_digest"])]
        return pd.DataFrame(
            {"filename": [name], "content": [encode_snapshot_warc(rows, name)]})

    return (joined
            .withColumn("bucket",
                        F.pmod(F.xxhash64("url"), F.lit(n_shards)))
            .groupBy("bucket")
            .applyInPandas(build, "filename string, content binary"))


def read_snapshot_records(shards):
    """(filename, content) snapshot shards -> one row per stored record:
    (url, record_type, payload_digest, stored_len), streamed via
    :func:`_iter_records` with the splitter's bounded flush discipline.

    ``stored_len`` is the byte length of the payload the archive
    actually stores — 0 for a revisit record (whose digest is read back
    from its WARC-Payload-Digest header), the HTTP-stripped payload
    length for a response record (whose digest is recomputed from the
    stored bytes, so a writer/parser byte slip fails the oracle hash)."""
    import hashlib

    import pandas as pd

    def split(batches):
        cols = {k: [] for k in ("url", "record_type", "payload_digest",
                                "stored_len")}
        n = 0
        for pdf in batches:
            for blob in pdf["content"]:
                stats = {"corrupt": 0}
                for h, body, _, _ in _iter_records(bytes(blob), stats):
                    rtype = h.get("warc-type")
                    if rtype == "response":
                        payload = _payload_of(body)
                        digest = hashlib.md5(payload).hexdigest()
                        slen = len(payload)
                    elif rtype == "revisit":
                        digest = h.get("warc-payload-digest",
                                       "").split(":", 1)[-1]
                        slen = 0
                    else:
                        continue
                    cols["url"].append(h.get("warc-target-uri", ""))
                    cols["record_type"].append(rtype)
                    cols["payload_digest"].append(digest)
                    cols["stored_len"].append(slen)
                    n += 1
                    if n >= WARC_SPLIT_BATCH_ROWS:
                        yield pd.DataFrame(cols)
                        cols = {k: [] for k in cols}
                        n = 0
        if n:
            yield pd.DataFrame(cols)

    return shards.mapInPandas(
        split,
        "url string, record_type string, payload_digest string, "
        "stored_len long")
