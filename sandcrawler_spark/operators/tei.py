"""GROBID-output processing: TEI-XML header → biblio metadata, and the
Crossref reference-preparation pipeline.

Reference surface:

- ``python/sandcrawler/grobid.py:174-200`` (``GrobidClient.metadata``):
  parse the GROBID TEI-XML response and keep the biblio fields
  (title, authors, journal, date, doi) plus grobid_version /
  grobid_timestamp / language_code; an XML parse error turns the row
  into status 'bad-grobid-xml'. The reference delegates the parse to
  the ``grobid_tei_xml`` library (not in this container); here the
  header fields are extracted with stdlib ``xml.etree`` inside an
  Arrow-batched pandas UDF — golden-tested against the reference's
  real GROBID fixture
  (``python/tests/files/23b29ea…85.xml``). ``remove_encumbered()`` is
  N/A: only header metadata is read, never fulltext body.
- ``python/sandcrawler/grobid.py:17-37``
  (``clean_crossref_unstructured``): collapse an exact
  double-space-separated self-repetition, HTML-unescape only when one
  of the four entity markers is present, strip. The reference's
  ``raw.replace("  ", " ")`` on line 33 discards its result (a no-op);
  mirrored by simply not collapsing inner double spaces.
- ``python/sandcrawler/grobid.py:201-227``
  (``should_parse_crossref_ref``): skip refs that already carry a DOI,
  whose unstructured string is ≤ 6 chars after strip, or that have
  sufficient structured metadata (three alternative field
  combinations).
- ``python/sandcrawler/grobid.py:228-283`` (``crossref_refs``): from a
  Crossref work record, select the unstructured references that need
  GROBID parsing, cap at 2,000 per work preserving list order, clean
  each string, and emit rows keyed (source='crossref',
  source_id=lower(DOI), source_ts=indexed.date-time, key). The
  ``processCitationList`` HTTP hop itself is the external-service
  boundary (like wayback fetches) and is out of scope; this operator
  produces exactly the batch that call would consume.

Scale notes: the TEI parse is the only Python here (Arrow-batched, one
pass, no shuffle); cleaning and the should-parse predicate are pure
Catalyst; the 2,000-per-work cap is one keyed window (partial
top-k-able) — all linear, skew-free.
"""

from __future__ import annotations

import html as _html
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_TEI_NS = "{http://www.tei-c.org/ns/1.0}"
_XML_NS = "{http://www.w3.org/XML/1998/namespace}"

TEI_BIBLIO_TYPE = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("journal", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("grobid_version", T.StringType()),
        T.StructField("grobid_timestamp", T.StringType()),
        T.StructField("language_code", T.StringType()),
    ]
)


def _parse_tei_header(xml_text: str | None) -> dict:
    bad = {
        "status": "bad-grobid-xml",
        "title": None,
        "authors": None,
        "journal": None,
        "date": None,
        "doi": None,
        "grobid_version": None,
        "grobid_timestamp": None,
        "language_code": None,
    }
    if not xml_text:
        return bad
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return bad
    header = root.find(f"{_TEI_NS}teiHeader")
    if header is None:
        return bad
    lang = header.get(f"{_XML_NS}lang")
    app = header.find(
        f"{_TEI_NS}encodingDesc/{_TEI_NS}appInfo/{_TEI_NS}application"
    )
    file_desc = header.find(f"{_TEI_NS}fileDesc")
    title_el = (
        file_desc.find(f"{_TEI_NS}titleStmt/{_TEI_NS}title")
        if file_desc is not None
        else None
    )
    date_el = (
        file_desc.find(f"{_TEI_NS}publicationStmt/{_TEI_NS}date")
        if file_desc is not None
        else None
    )
    bibl = (
        file_desc.find(f"{_TEI_NS}sourceDesc/{_TEI_NS}biblStruct")
        if file_desc is not None
        else None
    )
    authors: list[str] = []
    journal = None
    doi = None
    if bibl is not None:
        for pers in bibl.findall(
            f"{_TEI_NS}analytic/{_TEI_NS}author/{_TEI_NS}persName"
        ):
            parts = [
                (el.text or "").strip()
                for el in pers
                if el.tag in (f"{_TEI_NS}forename", f"{_TEI_NS}middlename", f"{_TEI_NS}surname")
            ]
            name = " ".join(p for p in parts if p)
            if name:
                authors.append(name)
        monogr_title = bibl.find(f"{_TEI_NS}monogr/{_TEI_NS}title")
        if monogr_title is not None and (monogr_title.text or "").strip():
            journal = monogr_title.text.strip()
        for idno in bibl.iter(f"{_TEI_NS}idno"):
            if (idno.get("type") or "").upper() == "DOI" and (idno.text or "").strip():
                doi = idno.text.strip()
                break
    date = None
    if date_el is not None:
        date = date_el.get("when") or (date_el.text or "").strip() or None
    return {
        "status": "success",
        "title": (title_el.text or "").strip() or None if title_el is not None else None,
        "authors": authors or None,
        "journal": journal,
        "date": date,
        "doi": doi,
        "grobid_version": app.get("version") if app is not None else None,
        "grobid_timestamp": app.get("when") if app is not None else None,
        "language_code": lang,
    }


@F.pandas_udf(TEI_BIBLIO_TYPE)
def parse_tei_biblio_udf(xml_text: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_parse_tei_header(x) for x in xml_text])


def tei_biblio(df: DataFrame, xml_col: str = "tei_xml") -> DataFrame:
    """grobid.py:174-200 over a DataFrame of TEI-XML strings: adds a
    ``biblio`` struct column (status='bad-grobid-xml' on parse error,
    field layout per to_legacy_dict's biblio subset)."""
    return df.withColumn("biblio", parse_tei_biblio_udf(F.col(xml_col)))


_ENTITY_MARKERS = ["&#", "&amp;", "&gt;", "&lt;"]


@F.pandas_udf(T.StringType())
def _unescape_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: _html.unescape(x) if isinstance(x, str) else x)


def clean_crossref_unstructured_col(raw: Column) -> Column:
    """grobid.py:17-37 as column logic. Doubling-detect and strip stay
    in Catalyst; the (marker-gated) HTML unescape is the one
    vectorized-Python hop. Python's str.strip() removes all unicode
    whitespace (the reference's all-NBSP vector collapses to '');
    mirrored with a \\s|\\p{Z} regex trim."""
    subs = F.split(raw, "  ", -1)
    two = F.size(subs) == 2
    halved = F.when(
        two & (F.try_element_at(subs, F.lit(1)) == F.try_element_at(subs, F.lit(2))),
        F.try_element_at(subs, F.lit(1)),
    ).otherwise(F.array_join(subs, " "))
    marker = F.lit(False)
    for m in _ENTITY_MARKERS:
        marker = marker | halved.contains(m)
    unescaped = F.when(marker, _unescape_udf(halved)).otherwise(halved)
    return F.regexp_replace(unescaped, r"(^[\s\p{Z}]+)|([\s\p{Z}]+$)", "")


def _present(c: Column) -> Column:
    """Python truthiness of an optional string field."""
    return c.isNotNull() & (c != "")


def should_parse_crossref_ref_col(
    doi: Column,
    unstructured: Column,
    year: Column,
    author: Column,
    article_title: Column,
    series_title: Column,
    volume_title: Column,
    journal_title: Column,
    volume: Column,
    first_page: Column,
) -> Column:
    """grobid.py:201-227 as a when-chain predicate (True = send the
    ref's unstructured string to GROBID citation parsing)."""
    has_struct = (
        (
            _present(year)
            & _present(author)
            & (_present(article_title) | _present(series_title) | _present(volume_title))
        )
        | (_present(year) & _present(author) & _present(journal_title))
        | (_present(journal_title) & _present(volume) & _present(first_page))
    )
    return (
        ~_present(doi)
        & (F.length(F.trim(F.coalesce(unstructured, F.lit("")))) > 6)
        & ~has_struct
    )


def crossref_refs_prep(
    refs: DataFrame,
    doi_col: str = "work_doi",
    ts_col: str = "indexed_ts",
    max_refs_per_work: int = 2000,
) -> DataFrame:
    """grobid.py:228-283 minus the processCitationList HTTP hop: from a
    table of one row per (work DOI, indexed timestamp, position, key,
    ref fields), emit the batch that would be sent to GROBID —
    (source, source_id, source_ts, key, position, clean_ref) — with
    unstructured-missing and should-not-parse refs dropped and the
    2,000-per-work cap applied in list order (``refs`` must carry an
    integer ``position`` column; the reference truncates the Python
    list, i.e. keeps the first 2,000). The work-level DOI column must
    not be named ``doi`` — the per-ref field is ``DOI`` and Spark
    resolves names case-insensitively."""
    keep = should_parse_crossref_ref_col(
        F.col("DOI"),
        F.col("unstructured"),
        F.col("year"),
        F.col("author"),
        F.col("article_title"),
        F.col("series_title"),
        F.col("volume_title"),
        F.col("journal_title"),
        F.col("volume"),
        F.col("first_page"),
    )
    w = Window.partitionBy(doi_col).orderBy(F.col("position"))
    return (
        refs.filter(_present(F.col("unstructured")) & keep)
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= max_refs_per_work)
        .select(
            F.lit("crossref").alias("source"),
            F.lower(F.col(doi_col)).alias("source_id"),
            F.col(ts_col).alias("source_ts"),
            F.col("key"),
            F.col("position"),
            clean_crossref_unstructured_col(F.col("unstructured")).alias("clean_ref"),
        )
    )


TEI_BODY_TYPE = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("word_count", T.IntegerType()),
    ]
)


def _tei_body_words(xml_text: str | None) -> dict:
    """teixml_body_text + the word count taken on it
    (ingest_html.py:50-51,64-72). Mirrors two reference behaviors
    exactly: a parse failure is an error status, and the ``if body:``
    truthiness test — an ElementTree Element with TEXT but no child
    elements is FALSY, so a childless body yields word_count 0 (the
    reference inherits this stdlib quirk; trafilatura bodies always
    have <p> children so it is latent there)."""
    if not xml_text:
        return {"status": "empty-xml", "word_count": None}
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return {"status": "parse-error", "word_count": None}
    body = root.find(f".//{_TEI_NS}body")
    if body:
        text = " ".join(body.itertext())
    else:
        text = ""
    return {"status": "success", "word_count": len(text.split())}


@F.pandas_udf(TEI_BODY_TYPE)
def tei_body_words_udf(xml_text: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_tei_body_words(x) for x in xml_text])


def tei_body_stats(df: DataFrame, xml_col: str = "tei_xml") -> DataFrame:
    """html_extract_body_teixml's downstream half over a DataFrame of
    TEI-XML strings (the trafilatura HTML→TEI conversion itself is an
    external library, out of scope like the media codecs): adds a
    ``body`` struct with (status, word_count) — the word_count that
    feeds html_guess_scope (ingest_html.py:414)."""
    return df.withColumn("body", tei_body_words_udf(F.col(xml_col)))


def _tei_affiliations(xml_text: str | None) -> list[str] | None:
    """Raw affiliation strings from TEI header authors
    (grobid_affiliations.py:41-52): the reference parses the TEI, takes
    each author's structured affiliation, and keeps the unique ones
    (json.dumps set-dedup). Here the per-author <affiliation> element
    under analytic authors is flattened to its whitespace-normalized
    text (the "raw affiliation string" the script exists to harvest);
    uniqueness is preserved, output sorted (the reference's set order
    is hash-randomized — a sorted list is the deterministic
    equivalent)."""
    if not xml_text:
        return None
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return None
    affs: set[str] = set()
    for author in root.findall(
        f"{_TEI_NS}teiHeader/{_TEI_NS}fileDesc/{_TEI_NS}sourceDesc/"
        f"{_TEI_NS}biblStruct/{_TEI_NS}analytic/{_TEI_NS}author"
    ):
        aff = author.find(f"{_TEI_NS}affiliation")
        if aff is None:
            continue
        text = " ".join(" ".join(aff.itertext()).split())
        if text:
            affs.add(text)
    return sorted(affs) or None


@F.pandas_udf(T.ArrayType(T.StringType()))
def tei_affiliations_udf(xml_text: pd.Series) -> pd.Series:
    return xml_text.map(_tei_affiliations)


def tei_affiliations(
    df: DataFrame, xml_col: str = "tei_xml", id_col: str = "sha1hex"
) -> DataFrame:
    """grobid_affiliations.py end-to-end over a DataFrame of
    (sha1hex, tei_xml): one (id, affiliations) row per document that
    has at least one author affiliation — documents with none are
    dropped, exactly like the reference's ``if affiliations:`` print
    gate (:49-53). Arrow-batched single pass, no shuffle."""
    out = df.select(
        F.col(id_col).alias("sha1hex"),
        tei_affiliations_udf(F.col(xml_col)).alias("affiliations"),
    )
    return out.where(F.size("affiliations") > 0)
