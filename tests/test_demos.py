"""End-to-end runs of the reference entry-point pipelines (EP1-EP3)
over reference-shaped CSV fixtures.

Fixture rows mimic the reference generators' wire format exactly:
quoted CSV, one record per file (``data/raw_audit_trail/
audit_trail_0.csv`` = '"0","Harry","SalesRep","Modify","<ms>","5","3"';
``data/raw_browser_events/browser_events0.csv`` =
'"0","Bob","ViewVideo","<ms>"'), users/operations/actions drawn from
the generator domains (FileStreamDataGenerator.java:38-52,
BrowserStreamDataGenerator.java:39-45).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.streaming import demos, sinks

T0 = 1_712_637_000_000  # epoch ms, in the reference sample data's era

USERS = ["Tom", "Harry", "Bob"]
OPS = ["Create", "Modify", "Query", "Delete"]
ENTITIES = ["Customer", "SalesRep"]
ACTIONS = ["Login", "ViewVideo", "ViewLink", "ViewReview", "Logout"]


@pytest.fixture(scope="module")
def audit_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_audit_trail")
    for i in range(30):
        ms = T0 + i * 700  # ~0.7 s apart like the <=1 s generator pacing
        row = (f'"{i}","{USERS[i % 3]}","{ENTITIES[i % 2]}","{OPS[i % 4]}",'
               f'"{ms}","{(i % 10) + 1}","{(i % 4) + 1}"')
        (d / f"audit_trail_{i}.csv").write_text(row + "\n")
    return str(d)


@pytest.fixture(scope="module")
def browser_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_browser_events")
    # per-user scripted sessions incl. Login/Logout edges
    script = [("Bob", a) for a in ["Login", "ViewVideo", "ViewLink", "Logout",
                                   "Login", "ViewReview"]] + \
             [("Tom", a) for a in ["ViewVideo", "Login", "Logout"]]
    for i, (user, action) in enumerate(script):
        ms = T0 + i * 1500
        (d / f"browser_events{i}.csv").write_text(
            f'"{i}","{user}","{action}","{ms}"\n')
    return str(d)


def test_ep1_file_to_windowed_counts(spark, audit_dir, tmp_path):
    records, writer = demos.ep1_basic_streaming(
        spark, audit_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    out = spark.read.schema("window_start long, n long").csv(str(tmp_path / "out"))
    rows = {r["window_start"]: r["n"] for r in out.collect()}
    # 30 records, 0.7 s apart, 3 s windows -> every window holds 4-5 records
    # and closed windows (all but the last, watermark delay 0) are emitted
    assert sum(rows.values()) >= 25
    assert all(1 <= n <= 5 for n in rows.values())
    assert all(ws % 3000 == 0 for ws in rows)


def test_ep2_window_join_matches(spark, audit_dir):
    joined = demos.ep2_window_join(spark, audit_dir, audit_dir,
                                   width="5 seconds")
    sinks.run_to_memory(joined, "t_ep2")
    got = spark.table("t_ep2")
    # self-join: every record pairs with same-user records in its window
    # (incl. itself) -> row count equals the batch self-join count
    batch = (spark.read.schema(
        "id int, user string, entity string, operation string, "
        "epoch_ms long, duration int, change_count int")
        .option("quote", '"').csv(audit_dir)
        .select("user", F.timestamp_millis("epoch_ms").alias("ts")))
    w = F.window("ts", "5 seconds")
    b = batch.select("user", w.alias("w"))
    expect = b.alias("a").join(b.alias("b"), ["user", "w"]).count()
    assert got.count() == expect > 0


def test_ep3_event_time_counts(spark, audit_dir):
    agg = demos.ep3_event_time(spark, audit_dir)
    sinks.run_to_memory(agg, "t_ep3")  # append mode: closed windows only
    rows = spark.table("t_ep3").collect()
    assert len(rows) > 0
    assert all(r["n"] >= 1 and r["window_start"] % 1000 == 0 for r in rows)


def test_browser_sessions_dwell_times(spark, browser_dir):
    out = demos.ep_browser_sessions(spark, browser_dir)
    sinks.run_to_memory(out, "t_browser")
    rows = {r["event_id"]: (r["user"], r["prev_action"], r["duration_ms"])
            for r in spark.table("t_browser").collect()}
    # Bob: Login(0) ViewVideo(1) ViewLink(2) Logout(3) Login(4) ViewReview(5)
    assert rows[0] == ("Bob", "None", 0)          # first event, state empty
    assert rows[1] == ("Bob", "Login", 1500)      # dwell on Login
    assert rows[2] == ("Bob", "ViewVideo", 1500)
    assert rows[3] == ("Bob", "ViewLink", 1500)
    assert rows[4] == ("Bob", "None", 0)          # Logout cleared state
    assert rows[5] == ("Bob", "Login", 1500)
    # Tom: ViewVideo(6) Login(7) Logout(8)
    assert rows[6] == ("Tom", "None", 0)
    assert rows[7] == ("Tom", "None", 0)          # current == Login -> None
    assert rows[8] == ("Tom", "Login", 1500)


def test_audit_trail_malformed_rows_quarantined(spark, tmp_path):
    """One bad line must never kill the job (the reference's hand parse
    throws): PERMISSIVE quarantines it in _corrupt_record, drop skips
    it, fail reproduces the reference's behavior."""
    from demo_apache_flink_streaming_mode_spark.sources import batch as bsrc
    d = tmp_path / "csv"
    d.mkdir()
    good = '"0","Tom","Customer","Create","1712637000000","5","3"'
    bad = '"1","Harry","SalesRep","Modify","not_a_number","x","y"'
    (d / "a.csv").write_text(good + "\n" + bad + "\n")

    rows = bsrc.read_audit_trail_csv(spark, str(d)).collect()
    assert len(rows) == 2
    ok = [r for r in rows if r["_corrupt_record"] is None]
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(ok) == 1 and ok[0]["user"] == "Tom"
    assert ok[0]["event_time"] is not None
    assert len(corrupt) == 1 and "not_a_number" in corrupt[0]["_corrupt_record"]

    # collect, not count: CSV column pruning means a bare count() never
    # parses the typed fields, so malformedness goes undetected
    assert len(bsrc.read_audit_trail_csv(spark, str(d),
                                         on_malformed="drop").collect()) == 1
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        bsrc.read_audit_trail_csv(spark, str(d),
                                  on_malformed="fail").collect()
