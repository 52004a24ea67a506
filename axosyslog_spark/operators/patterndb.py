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

Spark-first execution (the asymptotic analog of the reference's
radix trie walk, radix.c:666-860): patterns compile into ordered
alternation regexes executed by regexp_replace into a framed result
string. The input is prepended with a \\x02 marker and each
alternative carries a sentinel capture group around that marker (Java
resets captures when it backtracks out of a failed alternative, so
exactly the winner's sentinel participates). The regexp_replace
renders the framed result

    \\x03 <header> <block_0> ... <block_{k-1}> [remainder]
    header  = $s_0 \\x01 $s_1 \\x01 ...   (winner's sentinel = \\x02)
    block_i = $f(i,1) \\x04 $f(i,2) \\x04 ... \\x01

from which everything decodes WITHOUT further regex work or O(rules)
per-row scanning:

- the header's rendered size is fixed (k separators + the one marker
  byte), so the winning ordinal is a single ``instr(result, \\x02)``
  byte scan;
- a LOSING block renders only its unconditional separator literals,
  len(fields_i)+1 bytes, a compile-time constant — so the winner's
  block starts at a byte offset that is a pure function of its
  ordinal, looked up from a constant array, and its fields come out
  with substr + substring_index + one small split.

The two radix tiers (complete-preferred, then partial — radix.c
_find_node_with_state) execute differently on the two dispatch paths,
each the measured winner for its shape (round 6,
tools/profile_pdb_variants.py):

- DISPATCH-TREE leaves (≥2 distinct literal prefixes) merge both
  tiers into ONE alternation per leaf — the leaf's complete-match
  alternatives (each anchored \\z) first, then the same bodies
  unanchored — so Java's left-to-right alternation try IS the
  complete-preferred two-pass collapsed into a single execution, and
  the winner ordinal decodes directly to the i / N+i index encoding.
  A leaf's member count is small, so its 2k-block replacement
  template stays cheap.
- The FLAT path (fewer than 2 distinct prefixes — no tree to bound
  the frame) keeps the literal two-pass: the complete-tier regex runs
  on every row and the partial-tier regex lazily on the rows that
  missed (~20% on the bench mix). Merging the tiers here DOUBLES the
  replacement template to O(2N) bytes that Java re-parses per
  MATCHING row, which measured 1.6x SLOWER at 50 rules (18.8 s vs
  11.7 s per 5M rows) than the second gated execution it avoids.

Alternation order IS precedence order (complete tier first where
merged, then longest-literal-prefix, declaration tiebreak), and
failed alternatives abort on their first literal byte — the engine's
left-to-right try is the prefix dispatch. The only residual
ruleset-size-proportional cost is the replacement template (a few
bytes per rule+field) that Java re-parses per matching row.
Everything stays inside whole-stage codegen with O(1) plan
expressions; no Python runs per row.

The complete-tier alternatives anchor with \\z (end of input, like
RE2's `$` and radix.c's full-consumption requirement) so a trailing
newline does NOT count as a complete match.

This composition is the scale path: at 10^12 rows a pandas-UDF trie
would move every text through Arrow; the alternation regex moves
nothing and lets Catalyst prune unreferenced field columns.

In-band framing contract: the framed decode requires the message text
to be free of the control bytes \\x01-\\x04. This is ENFORCED here:
match_idx()/apply() strip them with one F.translate before the text
reaches either tier regex (syslog payloads never legitimately carry
them — the reference's line-based sources strip control bytes too, so
behavior matches; hostile/binary input degrades to classification of
the stripped text instead of garbled rule_ids).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# In-band framing bytes for the single-execution classify+extract
# (see module docstring); message text containing any of them would
# garble extraction (syslog payloads never carry control bytes — the
# reference's NVTable would store them, but its line-based sources
# strip them first).
_BLOCK_SEP = "\x01"   # separates sentinels in the classify header
_MARK = "\x02"        # prepended to the text; each alt's sentinel captures it
_HIT = "\x03"         # result prefix proving the tier regex matched
_FIELD_SEP = "\x04"   # separates field values in the extract result
# first leaf-id character for the dispatch tree's LOCAL frames (see
# _leaf_res): clear of the framing bytes; leaf counts stay far below
# the surrogate range the id charset must avoid
_LEAF_ID_BASE = 0x10


def _strip_framing_bytes(text: Column) -> Column:
    """Enforce the in-band framing contract (module docstring):
    JVM-side translate removing \\x01-\\x04 before the text meets the
    framed classify/extract. Without this a literal \\x02 in hostile
    input would silently yield a wrong rule_id/field values.

    MUST stay a single-reference expression. A round-5 attempt gated
    the translate behind four contains() probes (standalone microbench
    3.3x faster on clean text), but the guard references `text` six
    times instead of once, and when a composed pipeline's optimizer
    collapses the materializing Project (CollapseProject re-inlines
    __pdb_txt into EVERY dispatch-tree node), the expression tree
    multiplies: the config-pipeline aggregate's generated
    processNext() blew past Janino's 64 KB method limit, task binaries
    grew 3.3 MB -> 18.4 MB, and the interpreted fallback OOMed a 16 GB
    heap on 10k rows (test_config). On the real apply path the guard's
    benefit was same-window noise anyway — the unconditional translate
    stays."""
    return F.translate(text, _BLOCK_SEP + _MARK + _HIT + _FIELD_SEP, "")


# back-compat name (round-1/2 API used \x01 as the group joiner)
_GROUP_SEP = _BLOCK_SEP

# IPv4 with per-octet 0..255 validation (r_parser_ip: each octet is
# value-checked; the parsers_e2e truth table rejects 256.256.256.256)
_IPV4_OCTET = r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9]{1,2})"
# the (?![0-9]) guard mirrors the scanner: it consumes the whole digit
# run of the last octet — a match never stops mid-number
_IPV4_FRAGMENT = rf"(?:{_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}(?![0-9])"
# IPv6 with at most ONE '::' compression (the standard alternation —
# r_parser_pcre_ip6 is inet_pton-strict and the e2e table rejects a
# double '::')
_IPV6_FRAGMENT = (
    r"(?:"
    r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,7}:"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2}"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3}"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4}"
    r"|(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5}"
    r"|[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6}"
    r"|:(?::[0-9A-Fa-f]{1,4}){1,7}"
    r"|::"
    r")"
    # r_parser_ip6 consumes the ENTIRE colon-hex run and then
    # validates (inet_pton) — a match must not stop inside the run,
    # so a malformed tail (e.g. a second '::') fails the class
    # instead of prefix-matching (parsers_e2e truth table)
    r"(?![0-9A-Fa-f:])"
)

# class -> (regex fragment WITHOUT capture group, spark cast type or None)
_CLASS_FRAGMENTS: dict[str, tuple[str, str | None]] = {
    "STRING": (r"[^\s]+", None),
    "NUMBER": (r"-?[0-9]+", "bigint"),
    "FLOAT": (r"-?[0-9]+(?:\.[0-9]+)?", "double"),
    # @DOUBLE@ is the radix parsers' legacy alias of @FLOAT@
    "DOUBLE": (r"-?[0-9]+(?:\.[0-9]+)?", "double"),
    "IPv4": (_IPV4_FRAGMENT, None),
    "IPv6": (_IPV6_FRAGMENT, None),
    "IPvANY": (rf"(?:{_IPV4_FRAGMENT}|{_IPV6_FRAGMENT})", None),
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


def parse_action_rate(rate: str | None) -> tuple[int, int]:
    """<action rate="N/Ts"> -> (N, T); bare "N" means N per second;
    a zero/absent quantum falls back to 1 (pdb-action.c
    pdb_action_set_rate:52-74). rate 0 / None = unlimited.

    Both numbers are read with atoi semantics — the leading digit run,
    0 on junk — because the reference tolerates strings like "5/2h"
    (atoi("2h") == 2) and loads configs with non-numeric rates as
    rate 0 rather than refusing to start.
    """
    if not rate:
        return (0, 1)

    def _atoi(s: str) -> int:
        m = re.match(r"\s*[+-]?\d+", s)
        return int(m.group(0)) if m else 0

    if "/" in rate:
        n, _, q = rate.partition("/")
        quantum = _atoi(q)
        return (_atoi(n), quantum if quantum > 0 else 1)
    return (_atoi(rate), 1)


@dataclass(frozen=True)
class PdbAction:
    """One <action>: trigger-gated synthetic message emission
    (modules/correlation/pdb-action.c). ``trigger`` is 'match' (the
    batch-meaningful one; 'timeout' belongs to grouping-stage
    correlation, see grouping.correlate), ``condition`` an optional
    template-condition string, ``values``/``tags`` the synthetic
    message payload (templates over the matched row's fields).
    ``rate``/``rate_quantum``: <action rate="N/Ts"> fires at most N
    synthetic messages per T seconds per correlation key (0 =
    unlimited); see apply_match_actions for the batch contract."""

    trigger: str = "match"
    condition: str | None = None
    values: tuple[tuple[str, str], ...] = ()
    tags: tuple[str, ...] = ()
    inherit_properties: bool = True
    rate: int = 0
    rate_quantum: int = 1


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
        self._build_combined()

    def _build_combined(self):
        """FLAT-path artifacts: one alternation regex PER TIER over a
        shared single-tier replacement frame (see module docstring):

            \\x03 <header> <block_0> ... <block_{N-1}> [remainder]
            header  = $s_0 \\x01 $s_1 \\x01 ... $s_{N-1} \\x01
            block_i = $f(i,1) \\x04 $f(i,2) \\x04 ... \\x01

        Tier structure on the flat path is DELIBERATELY two-pass
        (complete tier on every row, partial tier lazily where the
        complete tier missed) rather than the merged 2N-alternative
        single execution the dispatch-tree leaves use. Round-6
        measurement (tools/profile_pdb_variants.py, 5M rows, one
        process, output diff 0): the merged frame's replacement
        template doubles to O(2N) bytes and Java re-parses it per
        MATCHING row, which loses to the ~20%-of-rows second regex
        execution it saves — flat idx+groups 4.49→4.35 s at 4 rules
        and 18.8→11.7 s at 50 rules in two-pass form. Inside a
        dispatch-tree leaf the members count is small (template cost
        bounded), so there the merged single execution measured
        FASTER (apply 7.18→6.88 s / 10.48→9.66 s) and stays.

        Alternative i contributes its sentinel group first, then its
        field groups, so all group numbers are known at compile time.
        Only the winner's groups render; a LOSING block is just its
        unconditional separator literals — len(fields_i)+1 bytes, a
        compile-time constant — so the winner's block starts at a
        byte offset computable from its ordinal alone
        (``_block_offs``): extraction needs no splitting of the other
        blocks and no O(N) scan, just substr + substring_index."""
        alts: list[str] = []
        header: list[str] = []
        blocks: list[str] = []
        self._block_offs: list[int] = []
        n = len(self.patterns)
        # 1-based substr position of block 0: after "\x03" (1) and the
        # header, whose rendered size is fixed at N separators + the
        # single winning marker byte = n + 1
        off = n + 3
        g = 0  # running capture-group counter
        for c in self.patterns:
            g += 1  # sentinel group
            header.append(f"${g}{_BLOCK_SEP}")
            blocks.append(
                "".join(f"${g + j + 1}{_FIELD_SEP}" for j in range(len(c.fields)))
                + _BLOCK_SEP
            )
            g += len(c.fields)
            alts.append(f"(?:({_MARK}){c.body})")
            self._block_offs.append(off)
            # a losing block renders only its literal separators
            off += len(c.fields) + 1
        body = "|".join(alts)
        self._complete_re = f"^(?:{body})\\z" if alts else None
        self._partial_re = f"^(?:{body})" if alts else None
        self._repl = _HIT + "".join(header) + "".join(blocks)
        self._build_dispatch()

    def _build_dispatch(self):
        """Literal-prefix dispatch tree — the radix-trie analog
        (radix.c walks shared literal prefixes in ~O(len); a single
        flat alternation makes the regex engine attempt every
        alternative per row, O(rules)). Patterns are grouped by exact
        literal prefix; a binary when() tree over the SORTED prefixes
        routes each row to one small per-prefix alternation in
        O(log groups) string compares, so per-row regex cost stays
        ~flat as the ruleset grows.

        Correctness of the range dispatch: if a text T starts with any
        group prefix Q, then Q <= T lexicographically, and for the
        largest prefix P <= T every such Q is a prefix of P (first
        differing char would contradict P <= T). Each leaf therefore
        contains its exact-prefix patterns plus every pattern whose
        prefix is a proper prefix of it (including the empty-prefix
        catch-alls), in global precedence order — rows routed to a
        leaf they don't actually prefix-match just fail those
        alternatives and fall through to the ancestors/catch-alls.

        Each leaf renders a LOCAL frame (round 4): \\x03, one leaf-id
        character, then a header/blocks frame over the leaf's OWN
        members only. The global frame costs O(total rules) bytes of
        losing-block separators per row per regex execution — at 200
        rules that per-row string build dominated the whole apply().
        A local frame is O(leaf members); the leaf id plus two literal
        lookup tables (_leaf_idx_map: leaf×local -> global ordinal,
        _leaf_off_map: leaf×local -> block byte offset) recover the
        global decode in O(1). The flat (<2-prefix) path keeps the
        global frame."""
        by_prefix: dict[str, list] = {}
        for c in self.patterns:
            if c.literal_prefix:
                by_prefix.setdefault(c.literal_prefix, [])
        self._leaves = None
        self._leaf_idx_map: list[list[int]] = []
        self._leaf_off_map: list[list[int]] = []
        if len(by_prefix) < 2:
            return
        # leaf ids are single characters; stay clear of the surrogate
        # block (a ruleset would need ~55k distinct literal prefixes
        # to get near it — fall back to the flat path if ever hit)
        if len(by_prefix) > 0xD000 - _LEAF_ID_BASE:
            return
        leaves = []
        for li, k in enumerate(sorted(by_prefix)):
            members = [
                c
                for c in self.patterns
                if c.literal_prefix == k
                or (c.literal_prefix != k and k.startswith(c.literal_prefix))
            ]
            members.sort(key=lambda c: c.ordinal)
            merged, repl, offs = self._leaf_res(members, li)
            leaves.append((k, merged, repl))
            n = len(self.patterns)
            self._leaf_idx_map.append(
                [c.ordinal for c in members] + [c.ordinal + n for c in members]
            )
            self._leaf_off_map.append(offs)
        self._leaves = leaves
        # JIT note (round-4): one monolithic when()-tree over many
        # leaves generates a single codegen method whose bytecode
        # grows ~linearly with the leaf count (~1 KB/leaf; 48,889 at
        # 50 leaves) — past HotSpot's default DontCompileHugeMethods
        # ceiling (8000) such a method silently runs interpreted at a
        # measured ~30x per-expression cost. The fix that MEASURED
        # fastest is lifting the ceiling (-XX:-DontCompileHugeMethods,
        # set by session.get_spark; 50-rule 5M-row apply 31s -> 10s,
        # within 1.4x of the 4-rule flagship; C2 still compiles the
        # tree at 200 leaves, 13.3s/2M rows). Plan-restructuring
        # alternatives were all built and measured slower: chained
        # 6-leaf chunk columns (11.7s @50, 25s+ @200 — Spark never
        # splits per-operator consume methods because
        # ProjectExec.usedInputs only counts attrs referenced twice),
        # per-leaf guard columns, row-mode islands, and
        # methodSplitThreshold (no-ops on a monolithic CaseWhen).

    def _leaf_res(
        self, members, leaf_id: int
    ) -> tuple[str, str, list[int]]:
        """(merged_re, repl, block_offsets) for one dispatch leaf —
        LOCAL frame:

            \\x03 <leaf-id char> <header> <block_0> ... <block_{2k-1}>

        over the leaf's k members only (local capture-group and
        ordinal numbering), complete-anchored alternatives first then
        the partial tier, like the global frame. The rendered header
        is 2k separators plus the one winner-marker byte, so the
        winner's LOCAL ordinal is ``instr(res, \\x02) - 3`` and block
        j starts at the returned compile-time offset — O(members)
        bytes per row instead of O(total rules)."""
        lid = chr(_LEAF_ID_BASE + leaf_id)
        # the id lands in a Java replacement string: '$' (leaf 20) and
        # '\' (leaf 76) are metacharacters there and must be escaped
        lid_repl = lid.replace("\\", "\\\\").replace("$", "\\$")
        tiers = [(c, True) for c in members] + [(c, False) for c in members]
        body = "|".join(
            f"(?:({_MARK}){c.body}\\z)" if anchored else f"(?:({_MARK}){c.body})"
            for c, anchored in tiers
        )
        header: list[str] = []
        blocks: list[str] = []
        offs: list[int] = []
        # 1-based position of block 0: the 2 prefix chars (\x03 + id)
        # + 2k separators + 1 marker byte, then +1 for 1-based substr
        off = 2 * len(members) + 4
        g = 0
        for c, _anchored in tiers:
            g += 1  # sentinel group
            header.append(f"${g}{_BLOCK_SEP}")
            blocks.append(
                "".join(f"${g + j + 1}{_FIELD_SEP}" for j in range(len(c.fields)))
                + _BLOCK_SEP
            )
            g += len(c.fields)
            offs.append(off)
            off += len(c.fields) + 1
        repl = _HIT + lid_repl + "".join(header) + "".join(blocks)
        return (f"^(?:{body})", repl, offs)

    def _leaf_lookup(self, res: Column, table: list[list[int]]) -> Column:
        """Decode (leaf, local ordinal) from a local-framed result and
        look the pair up in a ragged 2D compile-time table. In range
        by construction whenever the result carries the \\x03 hit
        prefix (the caller guards)."""
        arr2d = F.array(
            *[F.lit(row).cast("array<int>") for row in table]
        )
        leaf1 = F.ascii(F.substring(res, 2, 1)) - (_LEAF_ID_BASE - 1)
        local1 = F.instr(res, _MARK) - 2
        return F.element_at(F.element_at(arr2d, leaf1), local1)

    def _tree_result(self, text: Column, marked: Column) -> Column:
        """Binary-search when() tree over the sorted leaf prefixes.
        Rows lexicographically below every prefix land in leaf 0,
        above every prefix in the last leaf — both only ever match
        their catch-all alternatives there. NULL text propagates NULL
        through every branch."""
        leaves = self._leaves

        def build(lo: int, hi: int) -> Column:
            if hi - lo == 1:
                _, merged, repl = leaves[lo]
                return F.regexp_replace(marked, merged, repl)
            mid = (lo + hi) // 2
            return F.when(text < leaves[mid][0], build(lo, mid)).otherwise(
                build(mid, hi)
            )

        return build(0, len(leaves))

    # round-1 API: `rules` was the compiled list
    @property
    def rules(self) -> list[CompiledPattern]:
        return self.patterns

    # --- single-execution classify + extract machinery ---

    def _merged_result(self, text: Column) -> Column:
        """TREE path: ONE regex execution per row — the routed leaf's
        merged two-tier alternation rendered into the framed result
        string (or the marked input unchanged — which starts with
        \\x02, not \\x03 — when no alternative matched)."""
        marked = F.concat(F.lit(_MARK), text)
        return self._tree_result(text, marked)

    def _flat_complete(self, text: Column) -> Column:
        """FLAT path pass 1: the complete-tier alternation on every
        row (framed result, or the marked input unchanged on miss)."""
        marked = F.concat(F.lit(_MARK), text)
        return F.regexp_replace(marked, self._complete_re, self._repl)

    def _flat_result(self, text: Column, complete: Column) -> Column:
        """FLAT path pass 2: rows that complete-matched reuse pass 1's
        frame; only the misses execute the partial-tier regex (the
        when() branches evaluate lazily in codegen). Two-pass is the
        measured winner on the flat path — see _build_combined."""
        marked = F.concat(F.lit(_MARK), text)
        partial = F.regexp_replace(marked, self._partial_re, self._repl)
        return F.when(complete.startswith(_HIT), complete).otherwise(partial)

    def _idx_from_result(
        self, res: Column, was_complete: Column | None = None
    ) -> Column:
        """Winning global index from the framed result of either path:
        flat (global frame, header byte-scan — every losing sentinel
        before the winner contributes exactly one separator byte, so
        the marker's byte position IS the winning ordinal; the caller
        passes ``was_complete`` to add the +N partial-tier offset) or
        dispatch tree (local frame, leaf-id + local ordinal through
        the _leaf_idx_map table, both tiers in one frame). NULL when
        the regex didn't match (result still starts with \\x02)."""
        if not self._leaves:
            n = len(self.patterns)
            ord0 = F.when(res.startswith(_HIT), F.instr(res, _MARK) - 2)
            return F.when(
                ord0.isNotNull(),
                ord0 + F.when(was_complete, F.lit(0)).otherwise(F.lit(n)),
            ).cast("int")
        return F.when(
            res.startswith(_HIT), self._leaf_lookup(res, self._leaf_idx_map)
        ).cast("int")

    def match_idx(self, text: Column) -> Column:
        """Winning compiled-pattern ordinal; ordinal+N encodes a
        partial (pattern-consumed, message-remainder) match; NULL if
        unmatched. Mirrors radix.c's complete-then-partial two-pass
        (merged into one alternation per dispatch-tree leaf; literal
        two-pass on the flat path).

        Standalone expression form (no projection staging) — fine for
        one-off classification; apply() stages the shared subtrees as
        materialized columns so each regex runs once per row."""
        if not self.patterns:
            return F.lit(None).cast("int")
        text = _strip_framing_bytes(text)
        if self._leaves:
            return self._idx_from_result(self._merged_result(text))
        complete = self._flat_complete(text)
        res = self._flat_result(text, complete)
        return self._idx_from_result(res, complete.startswith(_HIT))

    def classify(self, text: Column) -> Column:
        """rule_id of the winning rule, NULL if unclassified."""
        idx = self.match_idx(text)
        return self._rule_id_for(idx)

    @staticmethod
    def _lut(values: list, idx_mod: Column, typ: str) -> Column:
        """O(1) per-row lookup into a constant-folded literal array —
        per-rule metadata (rule_id/class/tags/group offsets) must NOT
        be when-chains: those cost O(rules) per row and blow past the
        codegen method-size limit on big rulesets.

        The isNotNull guard is load-bearing: Spark's element_at with a
        NULL *column* index returns the LAST element (it behaves like
        index -1) instead of NULL — unmatched rows would read rule N-1's
        metadata.

        Note on construction: F.lit(values) in PySpark 4.1.2 expands
        to array(*[lit(x)...]) — the same CreateArray expression as
        F.array(*lits); either way the all-literal CreateArray (plus
        the single array-level cast) is foldable, and Catalyst's
        ConstantFolding collapses it to one plan-time Literal during
        optimization, so the table is NOT rebuilt per row. The real
        changes behind the measured ~12s win on the 50-rule 5M-row
        apply() were the all-None short-circuit below and casting
        once at array level instead of per element."""
        if all(v is None for v in values):
            return F.lit(None).cast(typ)
        arr = F.lit(values).cast(f"array<{typ}>")
        return F.when(idx_mod.isNotNull(), F.element_at(arr, idx_mod + 1))

    def _rule_id_for(self, idx: Column) -> Column:
        n = len(self.patterns)
        if not self.patterns:
            return F.lit(None).cast("string")
        return self._lut(
            [c.rule.rule_id for c in self.patterns], idx % n, "string"
        )

    def _groups_from_result(self, res: Column, idx: Column) -> Column:
        """Field values of the winning alternative, sliced out of the
        framed result by the index-keyed compile-time byte offset
        (``_block_offs``, N entries — both flat tiers share the same
        single-tier frame, so the block ordinal is idx mod N) — the
        winner's block runs from there to its \\x01 terminator (field
        j at split element j, 1-based; the partial-tier message
        remainder sits after the LAST block and never reaches the
        slice). Zero additional regex work, zero O(rules)
        splitting/scanning per row.

        The identity ``transform`` is a DELIBERATE whole-stage-codegen
        stage break, not a no-op to clean up: higher-order functions
        are codegen-fallback, so Spark materializes a row here and
        starts a fresh codegen unit for the downstream field/value
        fan-out. Without it the entire apply() pipeline fuses into ONE
        generated method (~128 KB source for even a 4-rule set) that
        exceeds the JVM JIT's huge-method bytecode limit (~8 KB) and
        silently runs in the bytecode interpreter — measured 3-4x
        slower end-to-end. The split keeps both halves JIT-compiled;
        its cost is one small-array copy per row."""
        if self._leaves:
            # local frame: the offset comes from (leaf, local ordinal)
            # decoded off the result itself; guarded so unmatched rows
            # (result still starts \x02) never index the tables
            off = F.when(
                res.startswith(_HIT),
                self._leaf_lookup(res, self._leaf_off_map),
            )
        else:
            off = self._lut(
                self._block_offs, idx % max(len(self.patterns), 1), "int"
            )
        block = F.substring_index(
            res.substr(off, F.length(res)), _BLOCK_SEP, 1
        )
        groups = F.when(off.isNotNull(), F.split(block, _FIELD_SEP))
        return F.transform(groups, lambda v: v)

    def program_filter(self, program: Column) -> Column:
        """Program-selector match (ruleset <patterns> globs)."""
        from axosyslog_spark.operators.filters import glob_match

        if not self.programs:
            return F.lit(True)
        m = F.lit(False)
        for g in self.programs:
            m = m | F.coalesce(glob_match(program, g), F.lit(False))
        return m

    def apply_match_actions(
        self,
        df: DataFrame,
        values_ctx=None,
        ts_col: str = "ts",
        order_col: str = "turn_idx",
    ) -> DataFrame:
        """trigger='match' <actions>: every matched row whose rule
        carries an action (and passes its condition) emits ONE
        synthetic row with the action's <values> rendered and its
        <tags> in pdb_tags; inherit-properties keeps the original
        columns underneath (pdb-action.c / synthetic-message.c).
        Expects a frame already through apply() (rule_id + fields).
        Timeout-triggered actions are correlation-context constructs —
        see grouping.correlate.

        ``rate``-limited actions (<action rate="N/Ts">,
        pdb-ratelimit.c:1-56 + patterndb.c _is_action_within_rate_limit)
        fire at most N synthetic rows per T-second EVENT-TIME bucket
        per correlation key (the rule's context-scope columns +
        rule:action identity — the reference keys its token bucket by
        correlation_key(scope, msg, "rule_id:action_id")). Same
        windowed-allowance contract as grouping.rate_limit_bucket:
        the reference's wall-clock token bucket carries fractional
        credits across arrivals, which is inherently sequential; the
        event-time bucket admits the same steady-state N per T and is
        deterministic under replay. Ordered by ``order_col`` within a
        bucket (falls back to ``ts_col``, then arbitrary). Unrated
        actions are untouched (rate 0 = unlimited, like the
        reference's early return).

        Pass-through semantics: returns original rows (synthetic=false)
        + synthetic rows (synthetic=true), like inject-mode
        pass-through.

        Plan shape: ONE pass regardless of action count — every
        (rule, action) compiles to a conditional struct in a single
        array; `explode(filter(array, nonnull))` emits the firing
        actions' rows. A 500-action ruleset therefore costs one
        Generate node, not 500 unions (round-2 verdict item: the
        per-(rule,action) union grew plan width O(actions))."""
        from axosyslog_spark.functions.template_compiler import (
            TemplateContext,
            compile_template,
            parse_condition,
        )

        base = df.withColumn("synthetic", F.lit(False))
        match_actions = [
            (rule, action)
            for rule in self.src_rules
            for action in rule.actions
            if action.trigger == "match"
        ]
        if not match_actions:
            return base
        ctx = values_ctx or TemplateContext(
            columns={f: F.col(f) for f in self.field_names}, field_fallback=True
        )
        # all value names any action writes; every struct carries all of
        # them (inherited-or-rendered) so the array element type is fixed
        value_names = sorted({n for _, a in match_actions for n, _ in a.values})

        def _inherit(name: str) -> Column:
            if name in df.columns:
                return F.col(name).cast("string")
            return F.lit(None).cast("string")

        inherit_tags = (
            F.col("pdb_tags")
            if "pdb_tags" in df.columns
            else F.lit(None).cast("array<string>")
        )
        structs: list[Column] = []
        for ordn, (rule, action) in enumerate(match_actions):
            cond = F.col("rule_id") == rule.rule_id
            if action.condition:
                cond = cond & parse_condition(action.condition, ctx)
            vals = dict(action.values)
            fields = [
                (
                    compile_template(vals[n], ctx) if n in vals else _inherit(n)
                ).alias(n)
                for n in value_names
            ]
            tags = (
                F.array(*[F.lit(t) for t in action.tags])
                if action.tags
                else inherit_tags
            )
            structs.append(
                F.when(
                    cond,
                    F.struct(
                        *fields,
                        tags.alias("pdb_tags"),
                        F.lit(ordn).alias("__ord"),
                    ),
                )
            )
        fired = F.filter(F.array(*structs), lambda s: s.isNotNull())
        synth = df.withColumn("__pdb_act", F.explode(fired))
        synth = synth.withColumns(
            {
                **{n: F.col(f"__pdb_act.{n}") for n in value_names},
                "pdb_tags": F.col("__pdb_act.pdb_tags"),
                "__pdb_ord": F.col("__pdb_act.__ord"),
                "synthetic": F.lit(True),
            }
        ).drop("__pdb_act")
        synth = self._rate_limit_actions(synth, match_actions, ts_col, order_col)
        return base.unionByName(synth.drop("__pdb_ord"), allowMissingColumns=True)

    @staticmethod
    def _rate_limit_actions(
        synth: DataFrame, match_actions, ts_col: str, order_col: str
    ) -> DataFrame:
        """First-N-per-(correlation key, event-time bucket) filter over
        the exploded synthetic rows — see apply_match_actions. One
        window shuffle over the synthetic rows ONLY, and only when at
        least one action declares a rate."""
        if not any(a.rate for _, a in match_actions):
            return synth
        from pyspark.sql import Window

        from axosyslog_spark.operators.grouping import _CONTEXT_SCOPE_COLS

        ordn = F.col("__pdb_ord")
        rates = F.lit([a.rate for _, a in match_actions]).cast("array<int>")
        quanta = F.lit(
            [max(a.rate_quantum, 1) for _, a in match_actions]
        ).cast("array<int>")
        rate_v = F.element_at(rates, ordn + 1)
        # correlation key per the firing action's rule scope: only the
        # scope columns present in the frame widen the key (a missing
        # column is a NULL key part in the reference, constant here)
        scope_key = F.lit("")
        for i, (rule, action) in enumerate(match_actions):
            if not action.rate:
                continue
            cols = [
                F.col(c)
                for c in _CONTEXT_SCOPE_COLS.get(rule.context_scope, ())
                if c in synth.columns
            ]
            scope_key = F.when(
                ordn == i, F.concat_ws("\x1f", *cols) if cols else F.lit("")
            ).otherwise(scope_key)
        if ts_col in synth.columns:
            quantum_v = F.element_at(quanta, ordn + 1)
            bucket = F.floor(
                F.col(ts_col).cast("timestamp").cast("double") / quantum_v
            )
        else:
            bucket = F.lit(0)
        order = (
            F.col(order_col)
            if order_col in synth.columns
            else (F.col(ts_col) if ts_col in synth.columns else F.lit(1))
        )
        w = Window.partitionBy(ordn, scope_key, bucket).orderBy(order)
        return (
            synth.withColumn("__rn", F.row_number().over(w))
            .filter((rate_v == 0) | (F.col("__rn") <= rate_v))
            .drop("__rn")
        )

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

        Deliberate projection staging: each heavy subtree (the merged
        tier regexp_replace, the winning index, the groups array) is
        materialized once as a plain attribute reference before
        anything fans out over it — folding them into one select would
        re-evaluate the regex per referencing column (Catalyst's
        CollapseProject keeps multiply-referenced non-cheap aliases
        staged, which is exactly what we rely on).
        """
        text = _strip_framing_bytes(F.col(text_col))
        n = len(self.patterns)
        idx_col, groups_col = f"__pdb_idx{prefix}", f"__pdb_groups{prefix}"
        r_col = f"__pdb_r{prefix}"
        if not self.patterns:
            df = df.withColumns(
                {idx_col: F.lit(None).cast("int"),
                 groups_col: F.lit(None).cast("array<string>")}
            )
        else:
            gated = text
            if program_col is not None and self.programs:
                # program-selector gate: rows from other programs never
                # run the message regexes (the program-trie hop of
                # radix.c) — NULL text short-circuits the regex
                gated = F.when(self.program_filter(F.col(program_col)), text)
            # materialize the sanitized (and program-gated) text ONCE:
            # the dispatch-tree compares reference it at every node,
            # and an inline expression would re-run the translate per
            # reference per row
            txt_col = f"__pdb_txt{prefix}"
            df = df.withColumn(txt_col, gated)
            gated = F.col(txt_col)
            if self._leaves:
                # TREE: stage 1 — merged two-tier alternation (ONE
                # regex execution per row, complete alternatives
                # first); stage 2 — framed result -> global ordinal
                # (leaf-table lookup); stage 3 — winner's block sliced
                # out by compile-time offset
                df = df.withColumn(r_col, self._merged_result(gated))
                df = df.withColumn(
                    idx_col, self._idx_from_result(F.col(r_col))
                )
                df = df.withColumn(
                    groups_col,
                    self._groups_from_result(F.col(r_col), F.col(idx_col)),
                ).drop(r_col, txt_col)
            else:
                # FLAT: two-pass tiers (complete every row, partial
                # lazily on the misses — the measured winner here, see
                # _build_combined), then the same ordinal/groups decode
                c_col = f"__pdb_c{prefix}"
                df = df.withColumn(c_col, self._flat_complete(gated))
                df = df.withColumn(
                    r_col, self._flat_result(gated, F.col(c_col))
                )
                df = df.withColumn(
                    idx_col,
                    self._idx_from_result(
                        F.col(r_col), F.col(c_col).startswith(_HIT)
                    ),
                )
                df = df.withColumn(
                    groups_col,
                    self._groups_from_result(F.col(r_col), F.col(idx_col)),
                ).drop(c_col, r_col, txt_col)
        idx = F.col(idx_col)
        mod = idx % max(n, 1)
        proj2 = {
            f"{prefix}rule_id": self._rule_id_for(idx),
        }
        if with_class:
            proj2[f"{prefix}rule_class"] = self._lut(
                [c.rule.rule_class or None for c in self.patterns], mod, "string"
            )
        if with_tags:
            tag_arrays = [
                F.array(*[F.lit(t) for t in c.rule.tags])
                if c.rule.tags
                else F.lit(None).cast("array<string>")
                for c in self.patterns
            ]
            proj2[f"{prefix}pdb_tags"] = F.when(
                mod.isNotNull(), F.element_at(F.array(*tag_arrays), mod + 1)
            )
        df = df.withColumns(proj2)
        groups = F.col(groups_col)

        # field extraction: per-field constant int array mapping ordinal
        # -> groups element (field j of the winner at element j, see
        # _groups_for); two element_at's per field per row, O(1) in the
        # ruleset size
        field_cols: dict[str, Column] = {}
        for name in self.field_names:
            offsets: list[int | None] = []
            for c in self.patterns:
                gi = next(
                    (i + 1 for i, f in enumerate(c.fields) if f.name == name), None
                )
                offsets.append(gi)
            gi_col = self._lut(offsets, mod, "int")
            # same NULL-index guard as _lut: a matched row whose rule
            # lacks this field has gi NULL but groups non-NULL
            expr = F.when(gi_col.isNotNull(), F.element_at(groups, gi_col))
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
                # when-chain only over the rules that define this value
                # (usually a handful); the per-rule metadata lookups
                # above are array-based for O(1) scaling
                for c in reversed(self.patterns):
                    tmpl = dict(c.rule.values).get(name)
                    if tmpl is not None:
                        expr = F.when(
                            mod == c.ordinal,
                            compile_template(tmpl, ctx),
                        ).otherwise(expr)
                value_cols[f"{prefix}{name}"] = expr
            df = df.withColumns(value_cols)

        return df.drop(idx_col, groups_col)
