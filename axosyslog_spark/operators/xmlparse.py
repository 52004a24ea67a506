"""xml-parser(): XML → dotted name-value pairs.

Reference: modules/xml/xml.c + lib/scanner/xml-scanner/ — element text
and attributes become dotted keys (`.xml.root.child`, attributes as
`.xml.root._attr`); repeated elements concatenate/list.

This is one of the few operators where column algebra genuinely can't
express the semantics, so it runs as an Arrow-batched pandas UDF over
stdlib xml.etree (no external deps). Per input_hint discipline the UDF
is vectorized per batch — Python never runs row-at-a-time through the
serializer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql.types import MapType, StringType


def _flatten_xml(
    text: str,
    prefix: str = "xml",
    create_lists: bool = True,
    strip_whitespaces: bool = False,
) -> dict[str, str]:
    """modules/xml/xml.c semantics (test_xml_parser.c ported):
    an element's value is the concatenation of its text segments
    INCLUDING the tails between/after children (mixed content
    'part1<x/>part2' -> 'part1part2'); repeated sibling elements
    become an LM_VT_LIST — comma-joined with str-repr quoting — under
    create-lists(yes) (the default) and concatenate verbatim under
    create-lists(no); whitespace survives unless
    strip-whitespaces(yes)."""
    import xml.etree.ElementTree as ET

    from axosyslog_spark.functions.template_compiler import _str_repr_py

    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return {}
    vals: dict[str, list[str]] = {}
    attrs: dict[str, str] = {}

    def seg(s: str | None) -> str:
        s = s or ""
        return s.strip() if strip_whitespaces else s

    def walk(el, path: str) -> None:
        key = f"{path}.{el.tag}"
        for aname, aval in el.attrib.items():
            attrs[f"{key}._{aname}"] = aval
        txt = seg(el.text)
        for child in el:
            walk(child, key)
            txt += seg(child.tail)
        if txt:
            vals.setdefault(key, []).append(txt)

    walk(root, prefix)
    out: dict[str, str] = {}
    for key, vlist in vals.items():
        if create_lists:
            out[key] = ",".join(_str_repr_py(v) for v in vlist)
        else:
            out[key] = "".join(vlist)
    out.update(attrs)
    return out


def xml_flatten_col(src, prefix: str = "xml"):
    """Column form of the XML dotted-key flatten (the filterx
    parse_xml() builtin, modules/xml/filterx-func-parse-xml via
    xml-scanner): map<string,string>, empty map on parse failure."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(MapType(StringType(), StringType()))
    def parse_batch(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _flatten_xml(t or "", prefix))

    return parse_batch(src)


def xml_parser(
    df: DataFrame, src_col: str = "text", out_col: str = "xml", prefix: str = "xml"
) -> DataFrame:
    """Adds a map<string,string> column of dotted XML fields (empty map
    on parse failure — pair with a filter for drop-invalid)."""
    return df.withColumn(out_col, xml_flatten_col(df[src_col], prefix))


def _flatten_winlog(text: str, prefix: str = "winlog") -> dict[str, str]:
    """windows-eventlog-xml-parser flatten
    (modules/xml/windows-eventlog-xml-parser.c, expectations from
    tests/test_windows_eventlog_xml_parser.c):

    - identical to the generic XML flatten, except ``<Data
      Name='k'>v</Data>`` under ``Event.EventData`` becomes
      ``{prefix}.Event.EventData.Data.k = v`` and neither the plain
      ``...Data`` key nor the ``...Data._Name`` attribute key is kept;
    - ``<Data>`` elements WITHOUT a Name attribute list-append onto
      ``{prefix}.Event.EventData.Data`` ("foo,bar");
    - XML namespaces are stripped (the scanner emits plain tag names:
      ``.winlog.Event.System.EventID``, not the xmlns-expanded form).
    """
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return {}
    out: dict[str, str] = {}
    data_path = f"{prefix}.Event.EventData"

    def tag(el) -> str:
        return el.tag.rsplit("}", 1)[-1]

    def walk(el, path: str) -> None:
        key = f"{path}.{tag(el)}"
        named_data = (
            path == data_path and tag(el) == "Data" and "Name" in el.attrib
        )
        for aname, aval in el.attrib.items():
            if named_data and aname == "Name":
                continue
            out[f"{key}._{aname}"] = aval
        txt = (el.text or "").strip()
        if named_data:
            out[f"{key}.{el.attrib['Name']}"] = txt
        elif txt:
            out[key] = out[key] + "," + txt if key in out else txt
        for child in el:
            walk(child, key)

    walk(root, prefix)
    return out


def winlog_flatten_col(src, prefix: str = "winlog"):
    """Column form of the windows-eventlog flatten (the filterx
    parse_windows_eventlog_xml() builtin)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(MapType(StringType(), StringType()))
    def parse_batch(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _flatten_winlog(t or "", prefix))

    return parse_batch(src)


def windows_eventlog_xml_parser(
    df: DataFrame, src_col: str = "text", out_col: str = "winlog",
    prefix: str = "winlog",
) -> DataFrame:
    """windows-eventlog-xml-parser(): EventData Data-name promotion on
    top of the generic dotted flatten; map<string,string> out column."""
    return df.withColumn(out_col, winlog_flatten_col(df[src_col], prefix))


def xml_parser_stream(
    df: DataFrame, src_col: str = "text", out_col: str = "xml", prefix: str = "xml"
) -> Iterator:  # pragma: no cover - thin alias
    """mapInPandas variant kept for API symmetry with multimodal."""
    return xml_parser(df, src_col, out_col, prefix)


def format_xml_fx(m):
    """filterx format_xml(dict) for a FLAT map<string,string>: each
    entry renders as <key>value</key> in map order, an empty value as
    the self-closing <key/> (modules/xml/filterx-func-format-xml.c
    append_inner_dict_end_tag's empty-body branch). Values are
    XML-escaped (& < >); the reference's nested-dict / @attribute
    forms have no meaning for a flat map column and are documented
    out of this subset."""
    from pyspark.sql import functions as F

    def esc(v):
        v = F.replace(v, F.lit("&"), F.lit("&amp;"))
        v = F.replace(v, F.lit("<"), F.lit("&lt;"))
        return F.replace(v, F.lit(">"), F.lit("&gt;"))

    return F.array_join(
        F.transform(
            F.map_entries(m),
            lambda e: F.when(
                F.coalesce(e["value"], F.lit("")) == "",
                F.concat(F.lit("<"), e["key"], F.lit("/>")),
            ).otherwise(
                F.concat(
                    F.lit("<"), e["key"], F.lit(">"),
                    esc(e["value"]),
                    F.lit("</"), e["key"], F.lit(">"),
                )
            ),
        ),
        "",
    )


def format_windows_eventlog_xml_fx(m):
    """filterx format_windows_eventlog_xml(dict) for a FLAT
    map<string,string> — format_xml_fx plus the windows rule
    (filterx-func-format-windows-eventlog-xml.c:30-66): a key of the
    form 'EventData.<Name>' (any dotted prefix before 'EventData.')
    renders as <Data Name='<Name>'>value</Data>, the empty value as
    the self-closing <Data Name='<Name>' />. Other keys render like
    format_xml; the reference's fully-nested dict walk applies the
    same leaf rule inside the EventData subtree."""
    from pyspark.sql import functions as F

    def esc(v):
        v = F.replace(v, F.lit("&"), F.lit("&amp;"))
        v = F.replace(v, F.lit("<"), F.lit("&lt;"))
        return F.replace(v, F.lit(">"), F.lit("&gt;"))

    def one(e):
        is_data = e["key"].rlike(r"(^|\.)EventData\.[^.]+$")
        name = F.regexp_extract(e["key"], r"EventData\.([^.]+)$", 1)
        empty = F.coalesce(e["value"], F.lit("")) == ""
        data = F.when(
            empty,
            F.concat(F.lit("<Data Name='"), name, F.lit("' />")),
        ).otherwise(
            F.concat(
                F.lit("<Data Name='"), name, F.lit("'>"),
                esc(e["value"]), F.lit("</Data>"),
            )
        )
        plain = F.when(
            empty, F.concat(F.lit("<"), e["key"], F.lit("/>"))
        ).otherwise(
            F.concat(
                F.lit("<"), e["key"], F.lit(">"), esc(e["value"]),
                F.lit("</"), e["key"], F.lit(">"),
            )
        )
        return F.when(is_data, data).otherwise(plain)

    return F.array_join(F.transform(F.map_entries(m), one), "")
