"""Multi-line assembly: join continuation lines into one message.

Reference: lib/multi-line/ — indented-multi-line.c (a line starting
with whitespace continues the previous), regexp-multi-line.c
(prefix/garbage patterns mark message starts), smart-multi-line.c
(per-line regex FSM detecting stack traces; .fsm TSV ruleset format).

Spark mapping: per-key event order, `is_start` boolean → running
`sum()` window assigns a segment id, then group-concat within
(key, segment). Two shuffles worst case (window + groupBy), both on
the same key so AQE/bucketing co-locates them. The smart FSM is
inherently sequential per stream, so it runs as ONE applyInPandas
pass per key (grouped, ordered) emitting the is_start flags — the
only Python-on-the-hot-path operator in the repo, Arrow-batched and
linear in group size.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assemble(
    df: DataFrame,
    is_start: Column,
    key: str = "conv_id",
    order: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Generic assembler: rows where ``is_start`` is true begin a new
    message; every other row continues the previous one."""
    w = Window.partitionBy(key).orderBy(order)
    seg = F.sum(F.when(is_start, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("__seg", seg)
    return (
        out.groupBy(key, "__seg")
        .agg(
            F.min(order).alias(order),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(order, text_col))),
                    lambda x: x[text_col],
                ),
                sep,
            ).alias("assembled"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .withColumnRenamed("__seg", "segment_id")
    )


def indented(
    df: DataFrame, key: str = "conv_id", order: str = "turn_idx",
    text_col: str = "text", sep: str = "\n",
) -> DataFrame:
    """indented-multi-line: whitespace-led lines continue the message."""
    return assemble(
        df, ~F.col(text_col).rlike(r"^[ \t]"), key, order, text_col, sep
    )


def regexp_prefix(
    df: DataFrame, prefix_re: str, key: str = "conv_id", order: str = "turn_idx",
    text_col: str = "text", sep: str = "\n",
) -> DataFrame:
    """regexp-multi-line(prefix): lines matching the prefix start a new
    message; the rest are continuations."""
    return assemble(
        df, F.col(text_col).rlike(prefix_re), key, order, text_col, sep
    )


# ---------------------------------------------------------------------------
# smart-multi-line: per-line regex FSM (lib/multi-line/smart-multi-line.c)
# ---------------------------------------------------------------------------

# Ruleset in the reference's .fsm TSV format:
#     comma-separated-from-states <TAB> /regexp/ <TAB> to-state
# This default table is an ORIGINAL compact ruleset covering the
# common stack-trace shapes (JVM, Python, Go) — the reference ships a
# larger Apache-2.0 table derived from fluent-plugin-detect-exceptions
# (smart-multi-line.fsm); users can load such a file via fsm_text.
DEFAULT_FSM = """
# The reference's shipped rule table (lib/multi-line/smart-multi-line.fsm,
# itself converted from Google's fluent-plugin-detect-exceptions,
# Apache-2.0) — the behavior users get from multi-line-mode(smart).

# java
start_state,java_start_exception	/(?:Exception|Error|Throwable|V8 errors stack trace)[:\\r\\n]/\tjava_after_exception
java_after_exception	/^[\\t ]*nested exception is:[\\t ]*/\tjava_start_exception
java_after_exception	/^[\\r\\n]*$/\tjava_after_exception
java_after_exception,java	/^[\\t ]+(?:eval )?at /\tjava
java_after_exception,java	/^[\\t ]+--- End of inner exception stack trace ---$/\tjava
java_after_exception,java	/^--- End of stack trace from previous location where exception was thrown ---$/\tjava
java_after_exception,java	/^[\\t ]*(?:Caused by|Suppressed):/\tjava_after_exception
java_after_exception,java	/^[\\t ]*... \\d+ (?:more|common frames omitted)/\tjava

# python
start_state	/^Traceback \\(most recent call last\\):$/\tpython
python	/^[\\t ]*File /\tpython_code
python_code	/[^\\t ]/\tpython
python	/^(?:[^\\s.():]+\\.)*[^\\s.():]+:/\tstart_state

# PHP
start_state	/(?:PHP (?:Notice|Parse error|Fatal error|Warning):)|(?:exception '[^']+' with message ')/\tphp_stack_begin
php_stack_begin	/^Stack trace:/\tphp_stack_frames
php_stack_frames	/^#\\d/\tphp_stack_frames
php_stack_frames	/^\\s+thrown in /\tstart_state

# Go
start_state	/\\bpanic: /\tgo_after_panic
start_state	/http: panic serving/\tgo_goroutine
go_after_panic,go_after_signal,go_frame_1	/^$/\tgo_goroutine
go_after_panic	/^\\[signal /\tgo_after_signal
go_goroutine	/^goroutine \\d+ \\[[^\\]]+\\]:$/\tgo_frame_1
go_frame_1	/^(?:[^\\s.:]+\\.)*[^\\s.():]+\\(|^created by /\tgo_frame_2
go_frame_2	/^\\s/\tgo_frame_1

# Ruby
start_state	/Error \\(.*\\):$/\truby_before_rails_trace
ruby_before_rails_trace	/^  $/\truby
ruby_before_rails_trace	/^[\\t ]+.*?\\.rb:\\d+:in `/\truby
ruby	/^[\\t ]+.*?\\.rb:\\d+:in `/\truby

# Dart
start_state	/^Unhandled exception:$/\tdart_exc
dart_exc	/^(Instance of)|(Exception)|(Bad state)|(IntegerDivisionByZeroException)|(Invalid argument)|(RangeError)|(Assertion failed)|(Cannot instantiate)|(Reading static variable)|(UnimplementedError)|(Unsupported operation)|(Concurrent modification)|(Out of Memory)|(Stack Overflow)/\tdart_stack
dart_exc	/^'.+?':.+?$/\tdart_type_err_1
dart_type_err_1	/^#\\d+\\s+.+?\\(.+?\\)$/\tdart_stack
dart_type_err_1	/^.+?$/\tdart_type_err_2
dart_type_err_2	/^.*?\\^.*?$/\tdart_type_err_3
dart_type_err_3	/^$/\tdart_type_err_4
dart_type_err_4	/^$/\tdart_stack
dart_exc	/^FormatException/\tdart_format_err_1
dart_format_err_1	/^#\\d+\\s+.+?\\(.+?\\)$/\tdart_stack
dart_format_err_1	/^./\tdart_format_err_2
dart_format_err_2	/^.*?\\^/\tdart_format_err_3
dart_format_err_3	/^$/\tdart_stack
dart_exc	/^NoSuchMethodError:/\tdart_method_err_1
dart_method_err_1	/^Receiver:/\tdart_method_err_2
dart_method_err_2	/^Tried calling:/\tdart_method_err_3
dart_method_err_3	/^Found:/\tdart_stack
dart_method_err_3	/^#\\d+\\s+.+?\\(.+?\\)$/\tdart_stack
dart_stack	/^#\\d+\\s+.+?\\(.+?\\)$/\tdart_stack
dart_stack	/^<asynchronous suspension>$/\tdart_stack
"""

START_STATE = "start_state"


def load_fsm(text: str) -> tuple[tuple[str, str, str], ...]:
    """Parse an .fsm TSV document into (from_state, regex, to_state)
    triples, one per from-state (rule order preserved — first match
    wins within a state, smart-multi-line.c _fsm_transition)."""
    rules: list[tuple[str, str, str]] = []
    for line in text.splitlines():
        line = line.strip("\n")
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        parts = line.split("\t")
        parts = [p for p in parts if p != ""]
        if len(parts) != 3:
            raise ValueError(f"malformed .fsm line: {line!r}")
        froms, rx, to = parts
        if not (rx.startswith("/") and rx.endswith("/")):
            raise ValueError(f".fsm regex must be /…/-delimited: {line!r}")
        for f in froms.split(","):
            rules.append((f.strip(), rx[1:-1], to.strip()))
    return tuple(rules)


@lru_cache(maxsize=8)
def _compiled_by_state(rules: tuple[tuple[str, str, str], ...]):
    by_state: dict[str, list[tuple[re.Pattern, str]]] = {}
    for frm, rx, to in rules:
        by_state.setdefault(frm, []).append((re.compile(rx), to))
    return by_state


def fsm_is_start_flags(lines: list[str], rules: tuple) -> list[bool]:
    """Run the FSM over one ordered stream; True = line starts a new
    message. Mirrors _process_segment: a failed transition retries
    once from start_state (a new trace may begin right after another);
    non-trace lines are standalone messages."""
    by_state = _compiled_by_state(rules)

    state = START_STATE

    def transition(line: str) -> bool:
        nonlocal state
        for pat, to in by_state.get(state, ()):
            if pat.search(line):
                state = to
                return True
        state = START_STATE
        return False

    flags: list[bool] = []
    for line in lines:
        last_ended = state == START_STATE
        part_of_trace = transition(line)
        starts_new = False
        if not part_of_trace:
            part_of_trace = transition(line)  # retry from start_state
            starts_new = part_of_trace
        else:
            starts_new = last_ended
        flags.append(starts_new or not part_of_trace)
    return flags


def smart(
    df: DataFrame,
    key: str = "conv_id",
    order: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    fsm_text: str | None = None,
) -> DataFrame:
    """smart-multi-line(): FSM-detected stack traces assemble into one
    message; every other line stands alone. One applyInPandas pass per
    key computes the start flags (the FSM is sequential by nature),
    then the shared window/groupBy assembler runs as column algebra.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    rules = load_fsm(fsm_text or DEFAULT_FSM)
    out_schema = StructType(
        list(df.schema.fields) + [StructField("__sml_start", BooleanType())]
    )

    def per_group(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf["__sml_start"] = fsm_is_start_flags(list(pdf[text_col]), rules)
        return pdf

    flagged = df.groupBy(key).applyInPandas(per_group, out_schema)
    return assemble(flagged, F.col("__sml_start"), key, order, text_col, sep)
