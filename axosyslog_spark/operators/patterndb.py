"""PatternDB / grok: multi-pattern classification + typed extraction.

Reference: db-parser() compiles an XML ruleset into a radix trie of
literal prefixes and typed wildcards, classifies each message and
extracts named typed fields (modules/correlation/radix.c:666-860 for
the parser classes, patterndb.c, dbparser.c). Pattern syntax:

    literal@CLASS:name:param@literal...      ('@@' escapes a literal @)

Parser classes (radix.c:277-860) — all 17:
  ESTRING:name:terminator  — consume up to terminator (excl.);
                             empty terminator = rest of line
  NLSTRING:name            — up to (excl.) \\r?\\n or end of input
  QSTRING:name:q           — quoted string; CAPTURES WITHOUT quotes
  STRING:name              — one whitespace-delimited word
  NUMBER:name              — integer (-> bigint)
  FLOAT:name               — decimal (-> double)
  IPv4/IPv6/IPvANY:name    — address literal
  MACADDR:name             — up to 6 colon-separated hex pairs
  LLADDR:name:k            — up to k colon-separated hex pairs
  EMAIL:name:brackets      — user@host, optional bracket chars around
                             (consumed, not captured)
  HOSTNAME:name            — dotted name
  SET:name:chars           — non-empty run of the given characters
  OPTIONALSET:name:chars   — possibly-empty run (always matches)
  PCRE:name:regex          — embedded regex (its groups de-captured)
  ANYSTRING:name           — rest of line

Match semantics mirror radix.c _find_node_with_state: a COMPLETE
match (entire message consumed) is preferred; when no rule matches
completely, a PARTIAL match (pattern fully consumed, message remainder
ignored) is accepted — see the `@MACADDR@` + trailing ".iii" cases in
modules/correlation/tests/test_radix.c. Within a tier, the rule with
the longest literal prefix wins (the radix longest-match preference),
declaration order breaking ties.

Spark-first execution: each pattern compiles to ONE anchored Java
regex. Classification is a `when` chain over the two tiers (cheap
`startswith` guards short-circuit rules whose literal prefix can't
match); extraction materializes ALL capture groups of the winning
pattern in ONE regex execution via regexp_replace into a separator-
joined string (the ``__pdb_groups`` array) — field columns then just
`element_at` from it. A row therefore pays at most (guards + winning
regex twice: classify + group-materialize), never 1+F regex runs like
a per-field regexp_extract would (Catalyst does not CSE across
withColumn projections). Everything stays inside whole-stage codegen;
no Python runs per row.

This composition is the scale path: at 10^12 rows a pandas-UDF trie
would move every text through Arrow; the `when` chain moves nothing
and lets Catalyst prune unreferenced field columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# group values are joined with this control char by the single-pass
# extractor; message text containing it would garble extraction
# (syslog payloads never carry \x01 — the reference's NVTable would)
_GROUP_SEP = "\x01"

# class -> (regex fragment WITHOUT capture group, spark cast type or None)
_CLASS_FRAGMENTS: dict[str, tuple[str, str | None]] = {
    "STRING": (r"[^\s]+", None),
    "NUMBER": (r"-?[0-9]+", "bigint"),
    "FLOAT": (r"-?[0-9]+(?:\.[0-9]+)?", "double"),
    "IPv4": (r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", None),
    "IPv6": (r"[0-9A-Fa-f:]+:[0-9A-Fa-f:]+", None),
    "IPvANY": (r"(?:(?:[0-9]{1,3}\.){3}[0-9]{1,3}|[0-9A-Fa-f:]+:[0-9A-Fa-f:]+)", None),
    # _r_parser_lladdr(parts=6): 1..6 colon-separated hex pairs
    "MACADDR": (r"(?:[0-9A-Fa-f]{2}:){0,5}[0-9A-Fa-f]{2}", None),
    "HOSTNAME": (r"[0-9A-Za-z][0-9A-Za-z._-]*", None),
    "ANYSTRING": (r".*", None),
    # r_parser_nlstring: up to \n (or end), a \r before the \n dropped
    "NLSTRING": (r"[^\n]*?(?=\r?\n|$)", None),
}

# r_parser_email: local part = alnum + "!#$%&'*+-/=?^_`{|}~.",
# host part = hostname chars — brackets/spaces never leak in
_EMAIL_CORE = r"[0-9A-Za-z!#$%&'*+/=?^_`{|}~.-]+@[0-9A-Za-z._-]+"


def _decapture(pattern: str) -> str:
    """Turn capturing groups of an embedded PCRE param into
    non-capturing ones so they don't shift our field numbering
    (the reference stores only the whole PCRE match)."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if c == "(" and not pattern.startswith("(?", i):
            out.append("(?:")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


@dataclass(frozen=True)
class PdbField:
    name: str
    cast: str | None  # spark type name, None = string


@dataclass(frozen=True)
class PdbAction:
    """One <action>: trigger-gated synthetic message emission
    (modules/correlation/pdb-action.c). ``trigger`` is 'match' (the
    batch-meaningful one; 'timeout' belongs to grouping-stage
    correlation, see grouping.correlate), ``condition`` an optional
    template-condition string, ``values``/``tags`` the synthetic
    message payload (templates over the matched row's fields)."""

    trigger: str = "match"
    condition: str | None = None
    values: tuple[tuple[str, str], ...] = ()
    tags: tuple[str, ...] = ()
    inherit_properties: bool = True


@dataclass(frozen=True)
class PdbRule:
    """One <rule>: id, one or more patterns, optional class/tags/values
    and match actions.

    ``values`` entries are (name, template-string) pairs rendered with
    functions.template_compiler when the rule wins (pdb-rule.c values;
    templates resolve extracted fields and any context columns).
    """

    rule_id: str
    pattern: str | tuple[str, ...]
    rule_class: str = ""
    tags: tuple[str, ...] = ()
    values: tuple[tuple[str, str], ...] = ()
    actions: tuple[PdbAction, ...] = ()
    # correlation context attributes (pdb-rule.c / synthetic-context.c):
    # context-id is a TEMPLATE; timeout in seconds; scope widens the key
    context_id: str | None = None
    context_timeout: int = 0
    context_scope: str = "process"

    @property
    def patterns(self) -> tuple[str, ...]:
        return (self.pattern,) if isinstance(self.pattern, str) else tuple(self.pattern)


@dataclass(frozen=True)
class CompiledPattern:
    rule: PdbRule
    body: str                       # regex body WITHOUT ^/$ anchors
    fields: tuple[PdbField, ...]    # in capture-group order (1-based)
    literal_prefix: str             # for the radix-style fast guard
    ordinal: int = -1               # position after longest-prefix sort

    @property
    def regex(self) -> str:
        """Complete-match regex (round-1 API)."""
        return f"^{self.body}$"

    @property
    def rule_id(self) -> str:
        return self.rule.rule_id


# back-compat alias (round-1 API)
CompiledRule = CompiledPattern


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


def compile_pattern(rule: PdbRule, pattern: str) -> CompiledPattern:
    """Pattern string -> regex body with ordered capture groups."""
    parts: list[str] = []
    fields: list[PdbField] = []
    prefix = ""
    prefix_open = True
    for kind, val in _split_pattern(pattern):
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
        pre = post = tail = ""
        cast = None
        if cls == "ESTRING":
            if param:
                frag = (
                    f"[^{re.escape(param[0])}]*"
                    if len(param) == 1
                    else f"(?:(?!{re.escape(param)}).)*"
                )
                tail = re.escape(param)
            else:
                frag = ".*"
        elif cls == "QSTRING":
            q = param or '"'
            lq, rq = (q[0], q[-1])
            # radix.c r_parser_qstring: the quotes are consumed but the
            # stored value excludes them (match ofs+1, len-2)
            pre, frag, post = re.escape(lq), f"[^{re.escape(rq)}]*", re.escape(rq)
        elif cls == "SET":
            frag = f"[{re.escape(param or ' ')}]+"
        elif cls == "OPTIONALSET":
            # r_parser_optionalset: like SET but zero-length matches too
            frag = f"[{re.escape(param or ' ')}]*"
        elif cls == "LLADDR":
            k = int(param) if param else 20
            frag = rf"(?:[0-9A-Fa-f]{{2}}:){{0,{k - 1}}}[0-9A-Fa-f]{{2}}"
        elif cls == "EMAIL":
            # param chars are consumed around the address, not captured
            if param:
                bracket = f"[{re.escape(param)}]*"
                pre, frag, post = bracket, _EMAIL_CORE, bracket
            else:
                frag = _EMAIL_CORE
        elif cls == "PCRE":
            if param is None:
                raise ValueError(f"PCRE needs a regex param in {pattern!r}")
            frag = f"(?:{_decapture(param)})"
        elif cls in _CLASS_FRAGMENTS:
            frag, cast = _CLASS_FRAGMENTS[cls]
        else:
            raise ValueError(f"unknown parser class {cls!r} in {pattern!r}")
        parts.append(pre)
        if name:
            parts.append(f"({frag})")
            fields.append(PdbField(name, cast))
        else:
            parts.append(f"(?:{frag})")
        parts.append(post)
        parts.append(tail)
    return CompiledPattern(rule, "".join(parts), tuple(fields), prefix)


def compile_rule(rule: PdbRule) -> CompiledPattern:
    """Back-compat: compile the rule's first pattern."""
    return compile_pattern(rule, rule.patterns[0])


class PatternDB:
    """A compiled rule set applicable to a DataFrame text column.

    ``programs``: optional program-selector globs (the ruleset-level
    <patterns> of the pdb document — radix.c routes a message through
    the program trie first); when set, apply(program_col=...) only
    classifies rows whose program matches one of them.
    """

    def __init__(self, rules: list[PdbRule], programs: tuple[str, ...] = ()):
        self.programs = tuple(programs)
        self._init_rules(rules)

    def _init_rules(self, rules: list[PdbRule]):
        compiled = [
            compile_pattern(r, p) for r in rules for p in r.patterns
        ]
        # radix preference: longest literal prefix first (more specific
        # rules win), declaration order as tiebreak — mirrors the
        # trie's longest-match walk without building a trie
        ordered = sorted(compiled, key=lambda c: -len(c.literal_prefix))
        self.patterns = [
            CompiledPattern(c.rule, c.body, c.fields, c.literal_prefix, i)
            for i, c in enumerate(ordered)
        ]
        self.field_names = sorted(
            {f.name for c in self.patterns for f in c.fields}
        )
        self._casts: dict[str, str | None] = {}
        for c in self.patterns:
            for f in c.fields:
                self._casts.setdefault(f.name, f.cast)
        self.value_names = sorted(
            {name for r in rules for name, _ in r.values}
        )
        self.src_rules = list(rules)

    # round-1 API: `rules` was the compiled list
    @property
    def rules(self) -> list[CompiledPattern]:
        return self.patterns

    def _guarded(self, text: Column, c: CompiledPattern, regex: str) -> Column:
        m = text.rlike(regex)
        if c.literal_prefix:
            m = text.startswith(c.literal_prefix) & m
        return m

    def match_idx(self, text: Column) -> Column:
        """Winning compiled-pattern ordinal; ordinal+N encodes a
        partial (pattern-consumed, message-remainder) match; NULL if
        unmatched. Mirrors radix.c's complete-then-partial two-pass."""
        n = len(self.patterns)
        expr = None
        for c in self.patterns:
            cond = self._guarded(text, c, f"^{c.body}$")
            branch = (expr.when if expr is not None else F.when)(cond, F.lit(c.ordinal))
            expr = branch
        for c in self.patterns:
            cond = self._guarded(text, c, f"^{c.body}")
            expr = expr.when(cond, F.lit(c.ordinal + n))
        return expr.otherwise(F.lit(None).cast("int")) if expr is not None else F.lit(None).cast("int")

    def classify(self, text: Column) -> Column:
        """rule_id of the winning rule, NULL if unclassified."""
        idx = self.match_idx(text)
        return self._rule_id_for(idx)

    def _rule_id_for(self, idx: Column) -> Column:
        n = len(self.patterns)
        expr = F.lit(None).cast("string")
        for c in reversed(self.patterns):
            expr = F.when(
                (idx == c.ordinal) | (idx == c.ordinal + n), F.lit(c.rule.rule_id)
            ).otherwise(expr)
        return expr

    def _groups_for(self, text: Column, idx: Column) -> Column:
        """ONE regex execution per row: the winning pattern's groups,
        materialized as an array. The replacement renders $1..$F
        joined by a separator; a trailing separator isolates any
        message remainder in the (ignored) last element for the
        partial-match tier."""
        n = len(self.patterns)
        expr = F.lit(None).cast("array<string>")
        for c in reversed(self.patterns):
            if not c.fields:
                continue
            repl = "".join(f"${i + 1}{_GROUP_SEP}" for i in range(len(c.fields)))
            full = F.split(F.regexp_replace(text, f"^{c.body}$", repl), _GROUP_SEP)
            part = F.split(F.regexp_replace(text, f"^{c.body}", repl), _GROUP_SEP)
            expr = (
                F.when(idx == c.ordinal, full)
                .when(idx == c.ordinal + n, part)
                .otherwise(expr)
            )
        return expr

    def program_filter(self, program: Column) -> Column:
        """Program-selector match (ruleset <patterns> globs)."""
        from axosyslog_spark.operators.filters import glob_match

        if not self.programs:
            return F.lit(True)
        m = F.lit(False)
        for g in self.programs:
            m = m | F.coalesce(glob_match(program, g), F.lit(False))
        return m

    def apply_match_actions(self, df: DataFrame, values_ctx=None) -> DataFrame:
        """trigger='match' <actions>: every matched row whose rule
        carries an action (and passes its condition) emits ONE
        synthetic row with the action's <values> rendered and its
        <tags> in pdb_tags; inherit-properties keeps the original
        columns underneath (pdb-action.c / synthetic-message.c).
        Expects a frame already through apply() (rule_id + fields).
        Timeout-triggered actions are correlation-context constructs —
        see grouping.correlate.

        Pass-through semantics: returns original rows (synthetic=false)
        + synthetic rows (synthetic=true), like inject-mode
        pass-through."""
        from axosyslog_spark.functions.template_compiler import (
            TemplateContext,
            compile_template,
            parse_condition,
        )

        base = df.withColumn("synthetic", F.lit(False))
        out = base
        ctx = values_ctx or TemplateContext(
            columns={f: F.col(f) for f in self.field_names}, field_fallback=True
        )
        for rule in self.src_rules:
            for action in rule.actions:
                if action.trigger != "match":
                    continue
                cond = F.col("rule_id") == rule.rule_id
                if action.condition:
                    cond = cond & parse_condition(action.condition, ctx)
                synth = df.filter(cond)
                updates = {
                    name: compile_template(tmpl, ctx)
                    for name, tmpl in action.values
                }
                if action.tags:
                    updates["pdb_tags"] = F.array(*[F.lit(t) for t in action.tags])
                synth = synth.withColumns(updates).withColumn(
                    "synthetic", F.lit(True)
                )
                out = out.unionByName(synth, allowMissingColumns=True)
        return out

    def apply(
        self,
        df: DataFrame,
        text_col: str = "text",
        prefix: str = "",
        values_ctx=None,
        with_class: bool = False,
        with_tags: bool = False,
        program_col: str | None = None,
    ) -> DataFrame:
        """Adds rule_id + one typed column per named field (+ optional
        rule_class / pdb_tags / rendered <values> columns).

        Field values come from the winning pattern only (NULL
        elsewhere), so rules sharing a field name compose like the
        reference's unified NV namespace.

        Three deliberate projections (match_idx | rule_id+groups |
        fields) so every heavy subtree is materialized once as a plain
        attribute reference — folding them into one select would
        re-evaluate the regexes per referencing column.
        """
        text = F.col(text_col)
        n = len(self.patterns)
        idx_col, groups_col = f"__pdb_idx{prefix}", f"__pdb_groups{prefix}"
        idx_expr = self.match_idx(text)
        if program_col is not None and self.programs:
            # program-selector gate: rows from other programs never run
            # the message regexes (the program-trie hop of radix.c)
            idx_expr = F.when(self.program_filter(F.col(program_col)), idx_expr)
        df = df.withColumn(idx_col, idx_expr)
        idx = F.col(idx_col)
        proj2 = {
            f"{prefix}rule_id": self._rule_id_for(idx),
            groups_col: self._groups_for(text, idx),
        }
        if with_class:
            cls = F.lit(None).cast("string")
            for c in reversed(self.patterns):
                if c.rule.rule_class:
                    cls = F.when(
                        (idx == c.ordinal) | (idx == c.ordinal + n),
                        F.lit(c.rule.rule_class),
                    ).otherwise(cls)
            proj2[f"{prefix}rule_class"] = cls
        if with_tags:
            tags = F.lit(None).cast("array<string>")
            for c in reversed(self.patterns):
                if c.rule.tags:
                    tags = F.when(
                        (idx == c.ordinal) | (idx == c.ordinal + n),
                        F.array(*[F.lit(t) for t in c.rule.tags]),
                    ).otherwise(tags)
            proj2[f"{prefix}pdb_tags"] = tags
        df = df.withColumns(proj2)
        groups = F.col(groups_col)

        field_cols: dict[str, Column] = {}
        for name in self.field_names:
            expr = F.lit(None).cast("string")
            # build reversed so earlier (higher-precedence) rules win
            for c in reversed(self.patterns):
                gi = next(
                    (i + 1 for i, f in enumerate(c.fields) if f.name == name), None
                )
                if gi is not None:
                    expr = F.when(
                        (idx == c.ordinal) | (idx == c.ordinal + n),
                        F.element_at(groups, gi),
                    ).otherwise(expr)
            cast = self._casts.get(name)
            if cast:
                expr = F.nullif(expr, F.lit("")).cast(cast)
            field_cols[f"{prefix}{name}"] = expr
        df = df.withColumns(field_cols)

        if self.value_names:
            from axosyslog_spark.functions.template_compiler import (
                TemplateContext,
                compile_template,
            )

            ctx = values_ctx or TemplateContext()
            ctx = TemplateContext(
                columns={
                    **{f: F.col(f"{prefix}{f}") for f in self.field_names},
                    **ctx.columns,
                },
                stamp=ctx.stamp, recvd=ctx.recvd, now=ctx.now,
                matches=ctx.matches, extras=ctx.extras,
            )
            value_cols: dict[str, Column] = {}
            for name in self.value_names:
                expr = (
                    F.col(f"{prefix}{name}").cast("string")
                    if f"{prefix}{name}" in df.columns
                    else F.lit(None).cast("string")
                )
                for c in reversed(self.patterns):
                    tmpl = dict(c.rule.values).get(name)
                    if tmpl is not None:
                        expr = F.when(
                            (idx == c.ordinal) | (idx == c.ordinal + n),
                            compile_template(tmpl, ctx),
                        ).otherwise(expr)
                value_cols[f"{prefix}{name}"] = expr
            df = df.withColumns(value_cols)

        return df.drop(idx_col, groups_col)
