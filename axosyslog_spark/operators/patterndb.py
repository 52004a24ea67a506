"""PatternDB / grok: multi-pattern classification + typed extraction.

Reference: db-parser() compiles an XML ruleset into a radix trie of
literal prefixes and typed wildcards, classifies each message and
extracts named typed fields (modules/correlation/radix.c:666-860 for
the parser classes, patterndb.c, dbparser.c). Pattern syntax:

    literal@CLASS:name:param@literal...      ('@@' escapes a literal @)

Supported classes (radix.c:277-860):
  ESTRING:name:terminator  — consume up to (and incl.) terminator;
                             empty terminator = rest of line
  QSTRING:name:q           — quoted string between q...q
  STRING:name              — one whitespace-delimited word
  NUMBER:name              — integer (-> bigint)
  FLOAT:name               — decimal (-> double)
  IPv4/IPv6/IPvANY:name    — address literal
  MACADDR:name             — aa:bb:cc:dd:ee:ff
  EMAIL:name               — user@host
  HOSTNAME:name            — dotted name
  SET:name:chars           — run of the given characters
  PCRE:name:regex          — embedded regex
  ANYSTRING:name           — rest of line

Spark-first execution: each rule compiles to ONE anchored Java regex;
the rule set is evaluated as a single projection — a `when` chain
ordered by longest-literal-prefix-first (the radix-trie preference:
more specific literal prefixes win, radix.c longest-match), with a
cheap `startswith` guard short-circuiting rules whose literal prefix
can't match. Everything stays inside whole-stage codegen; no Python
runs per row. Matched output: (rule_id, one column per named field,
typed).

This composition is the scale path: at 10^12 rows a pandas-UDF trie
would move every text through Arrow; the `when` chain moves nothing
and lets Catalyst prune unreferenced field columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class -> (regex fragment WITHOUT capture group, spark cast type or None)
_CLASS_FRAGMENTS: dict[str, tuple[str, str | None]] = {
    "STRING": (r"[^\s]+", None),
    "NUMBER": (r"-?[0-9]+", "bigint"),
    "FLOAT": (r"-?[0-9]+(?:\.[0-9]+)?", "double"),
    "IPv4": (r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", None),
    "IPv6": (r"[0-9A-Fa-f:]+:[0-9A-Fa-f:]+", None),
    "IPvANY": (r"(?:(?:[0-9]{1,3}\.){3}[0-9]{1,3}|[0-9A-Fa-f:]+:[0-9A-Fa-f:]+)", None),
    "MACADDR": (r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}", None),
    "EMAIL": (r"[^\s@]+@[^\s@]+", None),
    "HOSTNAME": (r"[0-9A-Za-z][0-9A-Za-z._-]*", None),
    "ANYSTRING": (r".*", None),
}


@dataclass(frozen=True)
class PdbField:
    name: str
    cast: str | None  # spark type name, None = string


@dataclass(frozen=True)
class CompiledRule:
    rule_id: str
    regex: str                      # anchored Java/RE2-compatible regex
    fields: tuple[PdbField, ...]    # in capture-group order (1-based)
    literal_prefix: str             # for the radix-style fast guard


@dataclass(frozen=True)
class PdbRule:
    rule_id: str
    pattern: str


def _split_pattern(pattern: str) -> list[tuple[str, str]]:
    """Split into [('lit', text) | ('class', spec)] segments; '@@' = '@'."""
    segs: list[tuple[str, str]] = []
    buf = ""
    i = 0
    in_class = False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "@":
            if not in_class and i + 1 < len(pattern) and pattern[i + 1] == "@":
                buf += "@"
                i += 2
                continue
            segs.append(("class" if in_class else "lit", buf))
            buf = ""
            in_class = not in_class
            i += 1
            continue
        buf += ch
        i += 1
    if in_class:
        raise ValueError(f"unterminated @CLASS@ in pattern: {pattern!r}")
    segs.append(("lit", buf))
    return [(k, v) for k, v in segs if v != "" or k == "class"]


def compile_rule(rule: PdbRule) -> CompiledRule:
    """Pattern string -> one anchored regex with ordered capture groups."""
    parts: list[str] = ["^"]
    fields: list[PdbField] = []
    prefix = ""
    prefix_open = True
    for kind, val in _split_pattern(rule.pattern):
        if kind == "lit":
            parts.append(re.escape(val))
            if prefix_open:
                prefix += val
            continue
        prefix_open = False
        spec = val.split(":", 2)
        cls = spec[0]
        name = spec[1] if len(spec) > 1 and spec[1] else None
        param = spec[2] if len(spec) > 2 else None
        if cls == "ESTRING":
            if param:
                frag, tail = f"[^{re.escape(param[0])}]*" if len(param) == 1 else f"(?:(?!{re.escape(param)}).)*", re.escape(param)
            else:
                frag, tail = ".*", ""
            cast = None
        elif cls == "QSTRING":
            q = param or '"'
            lq, rq = (q[0], q[-1])
            frag, tail = f"{re.escape(lq)}[^{re.escape(rq)}]*{re.escape(rq)}", ""
            cast = None
        elif cls == "SET":
            frag, tail = f"[{re.escape(param or ' ')}]+", ""
            cast = None
        elif cls == "PCRE":
            frag, tail = f"(?:{param})", ""
            cast = None
        elif cls in _CLASS_FRAGMENTS:
            frag, cast = _CLASS_FRAGMENTS[cls]
            tail = ""
        else:
            raise ValueError(f"unknown parser class {cls!r} in {rule.pattern!r}")
        if name:
            parts.append(f"({frag})")
            fields.append(PdbField(name, cast))
        else:
            parts.append(f"(?:{frag})")
        parts.append(tail)
    parts.append("$")
    return CompiledRule(rule.rule_id, "".join(parts), tuple(fields), prefix)


class PatternDB:
    """A compiled rule set applicable to a DataFrame text column."""

    def __init__(self, rules: list[PdbRule]):
        compiled = [compile_rule(r) for r in rules]
        # radix preference: longest literal prefix first (more specific
        # rules win), declaration order as tiebreak — mirrors the
        # trie's longest-match walk without building a trie
        self.rules = sorted(
            compiled,
            key=lambda c: -len(c.literal_prefix),
        )
        self.field_names = sorted(
            {f.name for c in self.rules for f in c.fields}
        )
        self._casts = {}
        for c in self.rules:
            for f in c.fields:
                self._casts.setdefault(f.name, f.cast)

    def _rule_match(self, text: Column, c: CompiledRule) -> Column:
        m = text.rlike(c.regex)
        if c.literal_prefix:
            m = text.startswith(c.literal_prefix) & m
        return m

    def classify(self, text: Column) -> Column:
        """rule_id of the winning rule, NULL if unclassified."""
        out = F.lit(None).cast("string")
        expr = None
        for c in self.rules:
            branch = F.when(self._rule_match(text, c), F.lit(c.rule_id))
            expr = branch if expr is None else expr.when(
                self._rule_match(text, c), F.lit(c.rule_id)
            )
        return expr.otherwise(out) if expr is not None else out

    def apply(
        self, df: DataFrame, text_col: str = "text", prefix: str = ""
    ) -> DataFrame:
        """Adds rule_id + one typed column per named field.

        Field value comes from the winning rule only (NULL elsewhere),
        so rules sharing a field name compose like the reference's
        unified NV namespace.
        """
        text = F.col(text_col)
        df = df.withColumn(f"{prefix}rule_id", self.classify(text))
        rid = F.col(f"{prefix}rule_id")
        for name in self.field_names:
            expr = F.lit(None).cast("string")
            # build reversed so earlier (higher-precedence) rules win
            for c in reversed(self.rules):
                gi = next(
                    (i + 1 for i, f in enumerate(c.fields) if f.name == name), None
                )
                if gi is not None:
                    expr = F.when(
                        rid == c.rule_id, F.regexp_extract(text, c.regex, gi)
                    ).otherwise(expr)
            cast = self._casts.get(name)
            if cast:
                expr = F.nullif(expr, F.lit("")).cast(cast)
            df = df.withColumn(f"{prefix}{name}", expr)
        return df
