"""smart-multi-line FSM tests (lib/multi-line/smart-multi-line.c
semantics over stack-trace corpora)."""

from __future__ import annotations

from axosyslog_spark.operators.multiline import (
    DEFAULT_FSM,
    fsm_is_start_flags,
    load_fsm,
    smart,
)

JAVA = [
    "before the crash",                                          # standalone
    "java.lang.IllegalStateException: boom",                     # trace start
    "\tat com.example.App.run(App.java:12)",
    "\tat com.example.Main.main(Main.java:3)",
    "Caused by: java.io.IOException: disk",
    "\tat com.example.Disk.read(Disk.java:44)",
    "\t... 3 more",
    "after the crash",                                           # standalone
]

PYTHON = [
    "Traceback (most recent call last):",
    '  File "app.py", line 3, in <module>',
    "    run()",
    "ValueError: bad input",
    "next plain line",
]

GO = [
    "panic: runtime error: index out of range",
    "",
    "goroutine 1 [running]:",
    "main.main()",
    "\t/app/main.go:10 +0x20",
    "created by main.init",
    "\t/app/main.go:5",
    "done",
]


def _flags(lines):
    return fsm_is_start_flags(lines, load_fsm(DEFAULT_FSM))


def test_java_trace_groups_into_one_message():
    flags = _flags(JAVA)
    assert flags == [True, True, False, False, False, False, False, True]


def test_python_traceback():
    flags = _flags(PYTHON)
    assert flags == [True, False, False, False, True]


def test_go_panic():
    flags = _flags(GO)
    assert flags == [True, False, False, False, False, False, False, True]


def test_back_to_back_traces_split():
    flags = _flags(PYTHON[:4] + PYTHON[:4])
    assert flags == [True, False, False, False, True, False, False, False]


def test_plain_lines_are_standalone():
    assert _flags(["a", "b", "c"]) == [True, True, True]


def test_load_fsm_rejects_malformed():
    import pytest

    with pytest.raises(ValueError):
        load_fsm("only two\tfields")
    with pytest.raises(ValueError):
        load_fsm("a\tnot-delimited\tb")


def test_smart_assemble_spark(spark):
    rows = [("c1", i, t) for i, t in enumerate(JAVA)] + [
        ("c2", i, t) for i, t in enumerate(PYTHON)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in smart(df).collect()
    }
    assert len([k for k in out if k[0] == "c1"]) == 3
    trace = out[("c1", 1)]
    assert trace["n_lines"] == 6 and trace["assembled"].startswith(
        "java.lang.IllegalStateException"
    )
    assert out[("c2", 0)]["n_lines"] == 4
    assert out[("c2", 4)]["assembled"] == "next plain line"


def test_reference_group_lines_functional_golden(spark):
    """The reference's group-lines functional test end-to-end
    (tests/light functional_tests/parsers/group-lines-parser): a
    Python traceback fed line-by-line through multi-line-mode(smart)
    assembles into ONE message, and $(format-welf MESSAGE) renders it
    with the reference's quoting (spaces -> quoted value, '\\n' and
    '\"' escaped)."""
    from axosyslog_spark.functions import templates as tf
    from axosyslog_spark.operators.multiline import smart
    from pyspark.sql import functions as F

    traceback = (
        'Traceback (most recent call last):\n'
        'File "./lib/merge-grammar.py", line 62, in <module>\n'
        '  for line in fileinput.input(openhook=fileinput.hook_encoded("utf-8")):\n'
        'File "/usr/lib/python3.8/fileinput.py", line 248, in __next__\n'
        '  line = self._readline()\n'
        'File "/usr/lib/python3.8/fileinput.py", line 368, in _readline\n'
        '  return self._readline()\n'
        'ValueError: This is the exception text at the end'
    )
    rows = [(0, i, ln) for i, ln in enumerate(traceback.split("\n"))]
    rows.append((0, 99, "whatvever: the exception text at the end"))
    df = spark.createDataFrame(rows, "conv_id long, turn_idx long, text string")
    out = sorted(
        smart(df)
        .select("turn_idx", tf.format_welf({"MESSAGE": F.col("assembled")}).alias("w"))
        .collect(),
        key=lambda r: r["turn_idx"],
    )
    assert len(out) == 2
    golden = 'MESSAGE="' + traceback.replace('"', '\\"').replace("\n", "\\n") + '"'
    assert out[0]["w"] == golden
    assert out[1]["w"] == 'MESSAGE="whatvever: the exception text at the end"'
