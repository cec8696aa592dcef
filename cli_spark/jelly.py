"""Jelly-style delimited stream frames over Spark (SURVEY.md §2.1 S9/S15,
§3.1-3.2).

The reference serializes RDF statement streams as length-delimited
protobuf ``RdfStreamFrame`` messages: an options header row, dictionary
entry rows (name table), and statement rows referencing dictionary ids
(/root/reference/src/main/scala/eu/neverblink/jelly/cli/command/rdf/
RdfToJelly.scala:130-199; row taxonomy per MetricsPrinter.scala:69-82).

This module re-expresses that as Spark jobs with a hand-rolled varint
wire format (the protobuf wire spec is public; no protobuf runtime in
this image):

- encode: triples → deterministic global order (W1) → bounded
  dictionary via first-occurrence dense_rank (W5) → frame assignment
  ``floor((rn-1)/rows_per_frame)`` (W2) → per-frame ``applyInPandas``
  varint encoder → frames table ``(frame_index, n_rows, frame_bytes)``.
- decode: frames table → ``mapInPandas`` varint decoder → row table →
  dictionary join → triples. Dictionary entries carry EXPLICIT ids
  (legal in Jelly, where implicit ids are prev+1), which makes decode
  order-free: any subset of frames can be decoded after one pass that
  collects entry rows — the two-scan replacement for the reference's
  sequential decoder state (P2, RdfFromJelly.scala:166-177).

Wire format (field numbers follow the reference's row-kind order):
  frame   := (row_tag=0x0A, len, row)*                [repeated field 1]
  row     := kind-tagged message:
      kind 1 OPTIONS : ver varint, physical_type varint, max_name varint
      kind 2 TRIPLE  : s_id, p_id, o_id varints, o_kind varint
      kind 4 NAME    : id varint, len, utf8 bytes
  file    := (varint frame_len, frame_bytes)* if delimited
             | frame_bytes                    if non-delimited
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

if TYPE_CHECKING:
    import pandas as pd

ROWS_PER_FRAME = 256  # reference default, RdfToJelly.scala:53-56
MAX_NAME_TABLE = 4096  # BIG-ish default; min 8 per reference tests
PHYSICAL_TRIPLES = 1
VERSION = 1

KIND_OPTIONS = 1
KIND_TRIPLE = 2
KIND_NAME = 4
KIND_DATATYPE = 7  # datatype lookup-table entry (3rd dictionary, S4)
MAX_DT_TABLE = 256

FRAME_SCHEMA = "seg long, frame_index long, n_rows int, frame_bytes binary"
ROW_SCHEMA = (
    "seg long, frame_index long, row_pos int, row_kind int, "
    "s_id long, p_id long, o_id long, o_kind int, name_id long, name string, "
    "dt_id long, lang string"
)


# ---------------------------------------------------------------------------
# varint primitives (protobuf wire spec — public)
# ---------------------------------------------------------------------------


def _write_varint(buf: io.BytesIO, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def encode_rows_to_frame(rows: list[tuple]) -> bytes:
    """rows: (row_kind, s_id, p_id, o_id, o_kind, name_id, name,
    dt_id, lang). Legacy 7-tuples are padded (no datatype/langtag)."""
    buf = io.BytesIO()
    for row in rows:
        if len(row) == 7:
            row = row + (None, None)
        kind, s_id, p_id, o_id, o_kind, name_id, name, dt_id, lang = row
        body = io.BytesIO()
        _write_varint(body, kind)
        if kind == KIND_OPTIONS:
            _write_varint(body, VERSION)
            # physical type rides in the s_id slot (TRIPLES when absent)
            _write_varint(body, PHYSICAL_TRIPLES if s_id is None else s_id)
            _write_varint(body, MAX_NAME_TABLE)
        elif kind == KIND_TRIPLE:
            _write_varint(body, s_id)
            _write_varint(body, p_id)
            _write_varint(body, o_id)
            _write_varint(body, o_kind)
            # datatype table ref (0 = none) + inline langtag (reference
            # keeps langtags inline too; only IRIs are dictionary-worthy)
            _write_varint(body, 0 if dt_id is None else dt_id)
            lraw = (lang or "").encode("utf-8")
            _write_varint(body, len(lraw))
            body.write(lraw)
        elif kind in (KIND_NAME, KIND_DATATYPE):
            raw = name.encode("utf-8")
            _write_varint(body, name_id)
            _write_varint(body, len(raw))
            body.write(raw)
        elif kind == KIND_GRAPH_START:
            _write_varint(body, name_id)  # graph term's dictionary id
        elif kind == KIND_GRAPH_END:
            pass  # no payload (MetricsPrinter.scala:69-82 row taxonomy)
        else:
            raise ValueError(f"unknown row kind {kind}")
        payload = body.getvalue()
        buf.write(b"\x0a")  # field 1, wire type 2 (length-delimited)
        _write_varint(buf, len(payload))
        buf.write(payload)
    return buf.getvalue()


def decode_frame(data: bytes) -> list[tuple]:
    rows, pos = [], 0
    while pos < len(data):
        tag = data[pos]
        pos += 1
        if tag != 0x0A:
            raise ValueError(f"unexpected tag {tag:#x} at {pos - 1}")
        length, pos = _read_varint(data, pos)
        end = pos + length
        kind, pos = _read_varint(data, pos)
        if kind == KIND_OPTIONS:
            ver, pos = _read_varint(data, pos)
            phys, pos = _read_varint(data, pos)
            max_name, pos = _read_varint(data, pos)
            rows.append((KIND_OPTIONS, ver, phys, max_name, None, None, None, None, None))
        elif kind == KIND_TRIPLE:
            s_id, pos = _read_varint(data, pos)
            p_id, pos = _read_varint(data, pos)
            o_id, pos = _read_varint(data, pos)
            o_kind, pos = _read_varint(data, pos)
            dt_id, pos = _read_varint(data, pos)
            llen, pos = _read_varint(data, pos)
            lang = data[pos : pos + llen].decode("utf-8") if llen else None
            pos += llen
            rows.append(
                (KIND_TRIPLE, s_id, p_id, o_id, o_kind, None, None,
                 dt_id or None, lang)
            )
        elif kind in (KIND_NAME, KIND_DATATYPE):
            name_id, pos = _read_varint(data, pos)
            nlen, pos = _read_varint(data, pos)
            name = data[pos : pos + nlen].decode("utf-8")
            pos += nlen
            rows.append((kind, None, None, None, None, name_id, name, None, None))
        elif kind == KIND_GRAPH_START:
            name_id, pos = _read_varint(data, pos)
            rows.append(
                (KIND_GRAPH_START, None, None, None, None, name_id, None, None, None)
            )
        elif kind == KIND_GRAPH_END:
            rows.append((KIND_GRAPH_END, None, None, None, None, None, None, None, None))
        else:
            raise ValueError(f"unknown row kind {kind}")
        if pos != end:
            raise ValueError("row length mismatch")
    return rows


# ---------------------------------------------------------------------------
# encode: triples DataFrame → frames DataFrame
# ---------------------------------------------------------------------------


def build_dictionary(ordered: DataFrame, max_size: int = MAX_NAME_TABLE) -> DataFrame:
    """(seg, term, term_id, first_rn): bounded name table per stream
    segment — dense_rank over first use WITHIN the segment (W5).

    Bounded-table semantics at scale: a truly evicting LRU dictionary is
    sequential encoder state. Instead the stream is cut into SEGMENTS of
    ``seg_rows`` statements; each segment is an independent Jelly
    sub-stream with its own dictionary (options row + entries), which is
    legal input per the reference's transcode contract — concatenated
    streams are accepted (U1, RdfTranscodeSpec.scala:53). Segment sizing
    guarantees ≤ 3·seg_rows distinct terms ≤ max_size, so no id ever
    needs eviction inside a segment, and every segment decodes
    independently (embarrassingly parallel at 100 TB).
    """
    terms = (
        ordered.select(
            "seg", F.col("rn"), F.explode(F.array("subj", "pred", "obj")).alias("term")
        )
        .groupBy("seg", "term")
        .agg(F.min("rn").alias("first_rn"))
    )
    w = W.partitionBy("seg").orderBy("first_rn", "term")
    ranked = terms.withColumn("term_id", F.dense_rank().over(w))
    return ranked.select("seg", "term", "term_id", "first_rn")


def encode_triples(
    spark: SparkSession,
    triples: DataFrame,
    rows_per_frame: int = ROWS_PER_FRAME,
    max_name_table: int = MAX_NAME_TABLE,
) -> DataFrame:
    """triples(subj, pred, obj, obj_kind) → frames(seg, frame_index,
    n_rows, frame_bytes).

    Layout per the reference's stream contract: each segment's first
    frame starts with an options row (P10, RdfValidate.scala:118-121);
    each dictionary entry row lands in the frame of its first use,
    before the statement that uses it (sort_key ordering inside the
    grouped encoder). Global row order comes from the partition-offset
    rank (cli_spark.order), not a single-task window.
    """
    seg_rows = max(rows_per_frame, (max_name_table // 3) // rows_per_frame * rows_per_frame)
    from .order import global_row_number

    # optional literal metadata columns (datatype table + inline langtag)
    has_dt = "obj_datatype" in triples.columns
    has_lang = "obj_lang" in triples.columns
    cols = [
        F.col("subj"),
        F.col("pred"),
        F.col("obj"),
        F.col("obj_kind"),
        (F.col("obj_datatype") if has_dt else F.lit(None).cast("string")).alias(
            "obj_datatype"
        ),
        (F.col("obj_lang") if has_lang else F.lit(None).cast("string")).alias(
            "obj_lang"
        ),
    ]
    ordered = global_row_number(
        triples.select(*cols).dropDuplicates(),
        ["subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang"],
    ).withColumn("seg", F.floor((F.col("rn") - 1) / seg_rows).cast("long"))
    dictionary = build_dictionary(ordered, max_name_table).persist()
    # datatype lookup table (3rd dictionary, bounded like the name table)
    dt_dict = (
        ordered.filter(F.col("obj_datatype").isNotNull())
        .groupBy("seg", "obj_datatype")
        .agg(F.min("rn").alias("first_rn"))
        .withColumn(
            "dt_id",
            F.dense_rank().over(W.partitionBy("seg").orderBy("first_rn", "obj_datatype")),
        )
    )
    frame_of = lambda rn: F.floor((rn - 1) / rows_per_frame).cast("long")  # noqa: E731

    d = dictionary
    trip_rows = (
        ordered.join(
            d.select("seg", F.col("term").alias("subj"), F.col("term_id").alias("s_id")),
            ["seg", "subj"],
        )
        .join(
            d.select("seg", F.col("term").alias("pred"), F.col("term_id").alias("p_id")),
            ["seg", "pred"],
        )
        .join(
            d.select("seg", F.col("term").alias("obj"), F.col("term_id").alias("o_id")),
            ["seg", "obj"],
        )
        .join(
            dt_dict.select(
                "seg",
                F.col("obj_datatype"),
                F.col("dt_id").alias("o_dt_id"),
            ),
            ["seg", "obj_datatype"],
            "left",
        )
        .select(
            "seg",
            frame_of(F.col("rn")).alias("frame_index"),
            F.col("rn").alias("sort_key"),
            F.lit(KIND_TRIPLE).alias("row_kind"),
            "s_id",
            "p_id",
            "o_id",
            F.col("obj_kind").alias("o_kind"),
            F.lit(None).cast("long").alias("name_id"),
            F.lit(None).cast("string").alias("name"),
            F.col("o_dt_id").alias("dt_id"),
            F.col("obj_lang").alias("lang"),
        )
    )
    name_rows = dictionary.select(
        "seg",
        frame_of(F.col("first_rn")).alias("frame_index"),
        F.col("first_rn").alias("sort_key"),
        F.lit(KIND_NAME).alias("row_kind"),
        F.lit(None).cast("long").alias("s_id"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("long").alias("o_id"),
        F.lit(None).cast("int").alias("o_kind"),
        F.col("term_id").alias("name_id"),
        F.col("term").alias("name"),
        F.lit(None).cast("long").alias("dt_id"),
        F.lit(None).cast("string").alias("lang"),
    )
    dt_rows = dt_dict.select(
        "seg",
        frame_of(F.col("first_rn")).alias("frame_index"),
        F.col("first_rn").alias("sort_key"),
        F.lit(KIND_DATATYPE).alias("row_kind"),
        F.lit(None).cast("long").alias("s_id"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("long").alias("o_id"),
        F.lit(None).cast("int").alias("o_kind"),
        F.col("dt_id").alias("name_id"),
        F.col("obj_datatype").alias("name"),
        F.lit(None).cast("long").alias("dt_id"),
        F.lit(None).cast("string").alias("lang"),
    )
    # one options row at the head of each segment's first frame
    options_rows = (
        ordered.select("seg", (F.col("seg") * seg_rows).alias("seg_first_rn"))
        .groupBy("seg")
        .agg(F.min("seg_first_rn").alias("first"))
        .select(
            "seg",
            frame_of(F.col("first") + 1).alias("frame_index"),
            F.lit(0).cast("long").alias("sort_key"),
            F.lit(KIND_OPTIONS).alias("row_kind"),
            F.lit(None).cast("long").alias("s_id"),
            F.lit(None).cast("long").alias("p_id"),
            F.lit(None).cast("long").alias("o_id"),
            F.lit(None).cast("int").alias("o_kind"),
            F.lit(None).cast("long").alias("name_id"),
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("long").alias("dt_id"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    all_rows = (
        options_rows.unionByName(name_rows)
        .unionByName(dt_rows)
        .unionByName(trip_rows)
    )

    def encode_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        # options first (sort_key 0); dictionary entries (kinds 7, 4)
        # before the TRIPLE (kind 2) that first uses them at equal
        # sort_key → kind descending
        pdf = pdf.sort_values(["sort_key", "row_kind"], ascending=[True, False])
        rows = [
            (
                int(r.row_kind),
                None if pd.isna(r.s_id) else int(r.s_id),
                None if pd.isna(r.p_id) else int(r.p_id),
                None if pd.isna(r.o_id) else int(r.o_id),
                None if pd.isna(r.o_kind) else int(r.o_kind),
                None if pd.isna(r.name_id) else int(r.name_id),
                r.name,
                None if pd.isna(r.dt_id) else int(r.dt_id),
                None if (not isinstance(r.lang, str) or not r.lang) else r.lang,
            )
            for r in pdf.itertuples()
        ]
        frame = encode_rows_to_frame(rows)
        return pd.DataFrame(
            {
                "seg": [int(pdf.seg.iloc[0])],
                "frame_index": [int(pdf.frame_index.iloc[0])],
                "n_rows": [len(rows)],
                "frame_bytes": [frame],
            }
        )

    # seg_rows is a multiple of rows_per_frame ⇒ each frame belongs to
    # exactly one segment; grouping carries both for the output schema.
    return all_rows.groupBy("seg", "frame_index").applyInPandas(encode_group, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# file I/O: delimited byte stream ⇄ frames table
# ---------------------------------------------------------------------------


def write_jelly_file(frames: DataFrame, path: str, delimited: bool = True) -> None:
    """Concatenate frames (ordered) into one delimited binary file.
    Driver-side assembly — a .jelly artifact is a single bounded file;
    the cluster-scale representation stays the frames table."""
    rows = frames.orderBy("seg", "frame_index").select("frame_bytes").collect()
    with open(path, "wb") as fh:
        for r in rows:
            if delimited:
                buf = io.BytesIO()
                _write_varint(buf, len(r.frame_bytes))
                fh.write(buf.getvalue())
            fh.write(r.frame_bytes)


def probe_delimited(path: str) -> bool:
    """Delimiting autodetect (S9, JellyUtil.scala:24-40): a delimited
    file starts with a varint length followed by the 0x0A row tag; a
    non-delimited one starts directly with 0x0A."""
    with open(path, "rb") as fh:
        head = fh.read(10)
    if not head:
        raise ValueError("empty stream")
    if head[0] == 0x0A:
        return False
    return True


def read_jelly_file(spark: SparkSession, path: str) -> DataFrame:
    """Binary file → frames table via binaryFile scan + frame splitting
    (each file row explodes into its frames; files are independent tasks,
    matching 'concatenated streams are valid input' U1)."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def split(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                data = bytes(r["content"])
                if not data:
                    continue
                if data[0] == 0x0A:  # non-delimited: exactly one frame
                    out.append((-1, 0, -1, data))
                    continue
                pos, idx = 0, 0
                while pos < len(data):
                    length, pos = _read_varint(data, pos)
                    out.append((-1, idx, -1, data[pos : pos + length]))
                    pos += length
                    idx += 1
            yield pd.DataFrame(
                out, columns=["seg", "frame_index", "n_rows", "frame_bytes"]
            )

    # seg = -1: segment boundaries are recovered from options rows after
    # decode (assign_segments) — a file has no out-of-band segment info.
    return raw.mapInPandas(split, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# decode: frames table → rows table → triples
# ---------------------------------------------------------------------------


def decode_frames(frames: DataFrame) -> DataFrame:
    """frames → row table (frame_index, row_pos, row_kind, ...) via
    Arrow-batched decoder."""

    def dec(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                for pos, row in enumerate(decode_frame(bytes(r["frame_bytes"]))):
                    kind = row[0]
                    base = (r["seg"], r["frame_index"], pos, kind)
                    if kind == KIND_OPTIONS:
                        out.append(base + (None,) * 8)
                    elif kind == KIND_TRIPLE:
                        out.append(
                            base
                            + (row[1], row[2], row[3], row[4], None, None, row[7], row[8])
                        )
                    else:
                        out.append(
                            base + (None, None, None, None, row[5], row[6], None, None)
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "seg", "frame_index", "row_pos", "row_kind", "s_id", "p_id",
                    "o_id", "o_kind", "name_id", "name", "dt_id", "lang",
                ],
            )

    return frames.mapInPandas(dec, ROW_SCHEMA)


def assign_segments(rows: DataFrame) -> DataFrame:
    """Recover segment ids for file-read streams (seg = -1): each options
    row starts a new segment — cumulative count over stream order. A
    single-task window, acceptable because .jelly FILE import is the
    bounded-artifact path (the cluster representation keeps seg)."""
    w = W.orderBy("frame_index", "row_pos").rowsBetween(W.unboundedPreceding, W.currentRow)
    return rows.withColumn(
        "seg",
        (F.sum(F.when(F.col("row_kind") == KIND_OPTIONS, 1).otherwise(0)).over(w) - 1).cast(
            "long"
        ),
    )


def decode_triples(
    rows: DataFrame, take_frames: tuple[int, int] | None = None
) -> DataFrame:
    """rows table → triples. Two-pass distributed decode (§3.2): pass 1
    materializes each segment's dictionary, pass 2 joins statement refs
    on (seg, id) — frame slicing (P1/P2 --take-frames) filters pass 2
    only, so skipped frames still contribute dictionary state exactly
    like the reference's state-preserving skip (RdfFromJelly.scala:166-177)."""
    if rows.filter(F.col("seg") < 0).limit(1).count() > 0:
        rows = assign_segments(rows)
    dictionary = (
        rows.filter(F.col("row_kind") == KIND_NAME)
        .select("seg", F.col("name_id").alias("term_id"), F.col("name").alias("term"))
        .dropDuplicates(["seg", "term_id"])
    )
    dt_dictionary = (
        rows.filter(F.col("row_kind") == KIND_DATATYPE)
        .select("seg", F.col("name_id").alias("ref_dt"), F.col("name").alias("obj_datatype"))
        .dropDuplicates(["seg", "ref_dt"])
    )
    trips = rows.filter(F.col("row_kind") == KIND_TRIPLE)
    if take_frames is not None:
        lo, hi = take_frames
        trips = trips.filter(F.col("frame_index").between(lo, hi))
    d = dictionary
    return (
        trips.join(
            d.select("seg", F.col("term_id").alias("s_id"), F.col("term").alias("subj")),
            ["seg", "s_id"],
        )
        .join(
            d.select("seg", F.col("term_id").alias("p_id"), F.col("term").alias("pred")),
            ["seg", "p_id"],
        )
        .join(
            d.select("seg", F.col("term_id").alias("o_id"), F.col("term").alias("obj")),
            ["seg", "o_id"],
        )
        .join(
            dt_dictionary.withColumnRenamed("ref_dt", "dt_id"),
            ["seg", "dt_id"],
            "left",
        )
        .select(
            "subj",
            "pred",
            "obj",
            F.col("o_kind").alias("obj_kind"),
            "obj_datatype",
            F.col("lang").alias("obj_lang"),
            "frame_index",
        )
    )


def roundtrip(spark: SparkSession, triples: DataFrame, **kw) -> DataFrame:
    """encode → decode, for equivalence gates (SURVEY §5 pillar 2)."""
    return decode_triples(decode_frames(encode_triples(spark, triples, **kw)))


# ---------------------------------------------------------------------------
# GRAPHS physical type (S16): graph-run boundary encoding
# ---------------------------------------------------------------------------

PHYSICAL_GRAPHS = 3
KIND_GRAPH_START = 5
KIND_GRAPH_END = 6
DEFAULT_GRAPH = ""  # encoded like any term; empty string = default graph


def encode_quads_graphs(
    spark: SparkSession,
    quads: DataFrame,
    rows_per_frame: int = ROWS_PER_FRAME,
    max_name_table: int = MAX_NAME_TABLE,
) -> DataFrame:
    """quads(subj, pred, obj, obj_kind, graph nullable) → frames, GRAPHS
    physical type (JellyStreamWriterGraphs.scala:19-95): statements are
    grouped into graph RUNS delimited by GraphStart(name)/GraphEnd rows;
    triple rows inside a run carry no graph term.

    The reference detects runs with sequential encoder state (`lastGraph`
    compare, :57-72); here the stream is ordered (graph, s, p, o) so runs
    are contiguous by construction, and the boundary rows fall out of a
    groupBy over (seg, graph) — min/max row number per run — instead of a
    row-at-a-time state machine. Dictionary, segmenting, and frame
    assignment are shared with the TRIPLES encoder.
    """
    seg_rows = max(
        rows_per_frame, (max_name_table // 4) // rows_per_frame * rows_per_frame
    )
    from .order import global_row_number

    g = F.coalesce(F.col("graph"), F.lit(DEFAULT_GRAPH))
    base = quads.select(
        "subj", "pred", "obj", "obj_kind", g.alias("graph")
    ).dropDuplicates()
    ordered = global_row_number(
        base, ["graph", "subj", "pred", "obj", "obj_kind"]
    ).withColumn("seg", F.floor((F.col("rn") - 1) / seg_rows).cast("long"))

    # dictionary covers graph names too (4 terms per statement)
    terms = (
        ordered.select(
            "seg",
            F.col("rn"),
            F.explode(F.array("subj", "pred", "obj", "graph")).alias("term"),
        )
        .groupBy("seg", "term")
        .agg(F.min("rn").alias("first_rn"))
    )
    wseg = W.partitionBy("seg").orderBy("first_rn", "term")
    dictionary = terms.withColumn("term_id", F.dense_rank().over(wseg)).persist()

    frame_of = lambda rn: F.floor((rn - 1) / rows_per_frame).cast("long")  # noqa: E731
    # sort_key leaves room around each statement: name entries at -5,
    # GraphStart at -2, the triple at 0, GraphEnd at +1.
    skey = lambda rn, off: (rn * 10 + off).cast("long")  # noqa: E731

    d = dictionary
    null_cols = [
        F.lit(None).cast("long").alias("s_id"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("long").alias("o_id"),
        F.lit(None).cast("int").alias("o_kind"),
    ]
    trip_rows = (
        ordered.join(
            d.select("seg", F.col("term").alias("subj"), F.col("term_id").alias("s_id")),
            ["seg", "subj"],
        )
        .join(
            d.select("seg", F.col("term").alias("pred"), F.col("term_id").alias("p_id")),
            ["seg", "pred"],
        )
        .join(
            d.select("seg", F.col("term").alias("obj"), F.col("term_id").alias("o_id")),
            ["seg", "obj"],
        )
        .select(
            "seg",
            frame_of(F.col("rn")).alias("frame_index"),
            skey(F.col("rn"), 0).alias("sort_key"),
            F.lit(KIND_TRIPLE).alias("row_kind"),
            "s_id",
            "p_id",
            "o_id",
            F.col("obj_kind").alias("o_kind"),
            F.lit(None).cast("long").alias("name_id"),
            F.lit(None).cast("string").alias("name"),
        )
    )
    name_rows = dictionary.select(
        "seg",
        frame_of(F.col("first_rn")).alias("frame_index"),
        skey(F.col("first_rn"), -5).alias("sort_key"),
        F.lit(KIND_NAME).alias("row_kind"),
        *null_cols,
        F.col("term_id").alias("name_id"),
        F.col("term").alias("name"),
    )
    # graph runs: contiguous by construction within a segment
    runs = ordered.groupBy("seg", "graph").agg(
        F.min("rn").alias("run_start"), F.max("rn").alias("run_end")
    )
    gdict = d.select(
        "seg", F.col("term").alias("graph"), F.col("term_id").alias("gid")
    )
    start_rows = (
        runs.join(gdict, ["seg", "graph"])
        .select(
            "seg",
            frame_of(F.col("run_start")).alias("frame_index"),
            skey(F.col("run_start"), -2).alias("sort_key"),
            F.lit(KIND_GRAPH_START).alias("row_kind"),
            *null_cols,
            F.col("gid").alias("name_id"),
            F.lit(None).cast("string").alias("name"),
        )
    )
    end_rows = runs.select(
        "seg",
        frame_of(F.col("run_end")).alias("frame_index"),
        skey(F.col("run_end"), 1).alias("sort_key"),
        F.lit(KIND_GRAPH_END).alias("row_kind"),
        *null_cols,
        F.lit(None).cast("long").alias("name_id"),
        F.lit(None).cast("string").alias("name"),
    )
    options_rows = (
        ordered.groupBy("seg")
        .agg(F.min("rn").alias("first"))
        .select(
            "seg",
            frame_of(F.col("first")).alias("frame_index"),
            F.lit(0).cast("long").alias("sort_key"),
            F.lit(KIND_OPTIONS).alias("row_kind"),
            F.lit(PHYSICAL_GRAPHS).cast("long").alias("s_id"),  # physical type
            F.lit(None).cast("long").alias("p_id"),
            F.lit(None).cast("long").alias("o_id"),
            F.lit(None).cast("int").alias("o_kind"),
            F.lit(None).cast("long").alias("name_id"),
            F.lit(None).cast("string").alias("name"),
        )
    )
    all_rows = (
        options_rows.unionByName(name_rows)
        .unionByName(start_rows)
        .unionByName(trip_rows)
        .unionByName(end_rows)
    )

    def encode_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        pdf = pdf.sort_values(["sort_key", "row_kind"], ascending=[True, False])
        rows = [
            (
                int(r.row_kind),
                None if pd.isna(r.s_id) else int(r.s_id),
                None if pd.isna(r.p_id) else int(r.p_id),
                None if pd.isna(r.o_id) else int(r.o_id),
                None if pd.isna(r.o_kind) else int(r.o_kind),
                None if pd.isna(r.name_id) else int(r.name_id),
                r.name,
            )
            for r in pdf.itertuples()
        ]
        frame = encode_rows_to_frame(rows)
        return pd.DataFrame(
            {
                "seg": [int(pdf.seg.iloc[0])],
                "frame_index": [int(pdf.frame_index.iloc[0])],
                "n_rows": [len(rows)],
                "frame_bytes": [frame],
            }
        )

    return all_rows.groupBy("seg", "frame_index").applyInPandas(
        encode_group, FRAME_SCHEMA
    )


def decode_quads_graphs(rows: DataFrame) -> DataFrame:
    """GRAPHS row table → quads: each triple takes the graph of the most
    recent GraphStart marker in stream order — the reference's decoder
    state (`currentGraph`) expressed as a `last(..., ignorenulls)` window
    per segment (W3's inverse). GraphEnd rows need no handling: the next
    run always opens with its own GraphStart before any triple."""
    if rows.filter(F.col("seg") < 0).limit(1).count() > 0:
        rows = assign_segments(rows)
    dictionary = (
        rows.filter(F.col("row_kind") == KIND_NAME)
        .select("seg", F.col("name_id").alias("term_id"), F.col("name").alias("term"))
        .dropDuplicates(["seg", "term_id"])
    )
    w = W.partitionBy("seg").orderBy("frame_index", "row_pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    with_gid = rows.withColumn(
        "gid",
        F.last(
            F.when(F.col("row_kind") == KIND_GRAPH_START, F.col("name_id")),
            ignorenulls=True,
        ).over(w),
    )
    trips = with_gid.filter(F.col("row_kind") == KIND_TRIPLE)
    d = dictionary
    out = (
        trips.join(
            d.select("seg", F.col("term_id").alias("s_id"), F.col("term").alias("subj")),
            ["seg", "s_id"],
        )
        .join(
            d.select("seg", F.col("term_id").alias("p_id"), F.col("term").alias("pred")),
            ["seg", "p_id"],
        )
        .join(
            d.select("seg", F.col("term_id").alias("o_id"), F.col("term").alias("obj")),
            ["seg", "o_id"],
        )
        .join(
            d.select("seg", F.col("term_id").alias("gid"), F.col("term").alias("graph")),
            ["seg", "gid"],
        )
        .select(
            "subj",
            "pred",
            "obj",
            F.col("o_kind").alias("obj_kind"),
            F.when(F.col("graph") == DEFAULT_GRAPH, F.lit(None)).otherwise(
                F.col("graph")
            ).alias("graph"),
            "frame_index",
        )
    )
    return out
