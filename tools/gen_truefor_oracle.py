#!/usr/bin/env python3
"""Independent oracle for the EVENT_WINDOW TRUE_FOR START/END streak
limits (reference eventwindowoperator.c:631-760): a straight-line
Python re-implementation of the streak state machine, run over the
driver's events table, emitting a pinned VALUES oracle for
`dialect_event_truefor_limits`.

Semantics pinned here (independently of the Scala code):
- window opens once the START condition holds for a consecutive streak
  meeting the start limit; _wstart backdates to the streak's first row;
- window closes once the END condition holds for a streak meeting the
  end limit; the window's LAST row is the streak's FIRST row; later
  streak rows are dropped and scanning resumes after the completing row;
- a broken end streak flushes its held rows back into the window;
- a row may complete the start streak and begin (or complete) the end
  streak at once;
- the window limit then filters emitted windows on (span, rowcount);
- an unclosed window at series end emits (basic-form parity).

Usage: python3 tools/gen_truefor_oracle.py /root/testdata/sf0.01
Prints the VALUES body to paste into PinnedOracles.sfEventTrueForLimits.
"""
import sys

import duckdb

H = 3_600_000_000  # 1h in us

START_COUNT = 2          # START(COUNT 2)
END_DUR, END_COUNT = H, 2  # END(1h OR COUNT 2)
WIN_COUNT = 2            # TRUE_FOR(COUNT 2, ...)
MAX_UID = 20


def limit_or(first_ts, ts, cnt, dur, n):
    ds = dur <= 0 or abs(ts - first_ts) >= dur
    cs = n <= 0 or cnt >= n
    return ds or cs


def windows_for(rows):
    """rows: [(ts, value)] sorted by ts -> [(wstart, wend, nrows)]."""
    out = []
    open_ = False
    wstart = 0
    cur = []            # rows emitted into the open window
    s_first, s_cnt, s_buf = 0, 0, []
    e_first, e_cnt, e_buf = 0, 0, []
    for ts, v in rows:
        s = v > 70
        e = v < 30
        if not open_:
            if not s:
                s_cnt, s_buf = 0, []
                continue
            if s_cnt == 0:
                s_first = ts
            s_cnt += 1
            s_buf.append(ts)
            if s_cnt >= START_COUNT:  # start limit: COUNT only
                open_ = True
                wstart = s_first
                cur = list(s_buf)
                s_cnt, s_buf = 0, []
                e_cnt, e_buf = 0, []
                if e:  # overlap: row also opens the end streak
                    e_first, e_cnt = ts, 1
                    if limit_or(e_first, ts, e_cnt, END_DUR, END_COUNT):
                        out.append((wstart, e_first, len(cur)))
                        open_, cur = False, []
                        e_cnt, e_buf = 0, []
        else:
            if e:
                if e_cnt == 0:
                    e_first, e_cnt = ts, 1
                    cur.append(ts)  # streak first row is the last window row
                    if limit_or(e_first, ts, e_cnt, END_DUR, END_COUNT):
                        out.append((wstart, e_first, len(cur)))
                        open_, cur = False, []
                        e_cnt, e_buf = 0, []
                else:
                    e_cnt += 1
                    if limit_or(e_first, ts, e_cnt, END_DUR, END_COUNT):
                        out.append((wstart, e_first, len(cur)))
                        open_, cur = False, []
                        e_cnt, e_buf = 0, []
                    else:
                        e_buf.append(ts)
            else:
                cur.extend(e_buf)
                e_cnt, e_buf = 0, []
                cur.append(ts)
    if open_:
        cur.extend(e_buf)  # unresolved streak at series end
        out.append((wstart, max(cur), len(cur)))
    return [(ws, we, n) for ws, we, n in out if n >= WIN_COUNT]


OUT = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..",
    "src/main/scala/graft/PinnedOracles.scala")


def keyed_windows(con, sf_dir):
    rows = con.execute(
        f"""SELECT user_id, epoch_us(ts), value
            FROM read_parquet('{sf_dir}/events.parquet')
            WHERE user_id < {MAX_UID}
            ORDER BY user_id, ts""").fetchall()
    series = {}
    for uid, ts, v in rows:
        series.setdefault(uid, []).append((ts, v))
    vals = []
    for uid in sorted(series):
        for ws, we, n in windows_for(series[uid]):
            vals.append((uid, ws // 1000, we // 1000, n))
    return vals


def keyless_windows(con, sf_dir):
    # one GLOBAL series over (ts, event_id) — the keyless route's
    # machine-input order (GlobalScan sorts by _ts then the tie)
    rows = con.execute(
        f"""SELECT epoch_us(ts), value
            FROM read_parquet('{sf_dir}/events.parquet')
            WHERE user_id < {MAX_UID}
            ORDER BY ts, event_id""").fetchall()
    return sorted((ws // 1000, we // 1000, n)
                  for ws, we, n in windows_for(rows))


def splice(src, val_name, sql_block):
    import re
    pat = re.compile(
        r'  val ' + val_name + r': String =\n    """.*?"""', re.DOTALL)
    assert pat.search(src), f"val {val_name} not found"
    return pat.sub(f'  val {val_name}: String =\n{sql_block}',
                   src, count=1)


def main(sf_dirs):
    """Splices scale-aware pinned oracles (discriminated on
    `count(*) FROM events`) for both the keyed and keyless gates into
    PinnedOracles.scala. Pass every scale the gate should hold at:
    `python3 tools/gen_truefor_oracle.py /root/testdata/sf0.01
    /root/testdata/sf0.1`."""
    con = duckdb.connect()
    keyed_b, keyless_b = [], []
    for sf_dir in sf_dirs:
        n_events = con.execute(
            f"SELECT count(*) FROM "
            f"read_parquet('{sf_dir}/events.parquet')").fetchone()[0]
        kv = keyed_windows(con, sf_dir)
        body = ",\n".join(f"            ({u}, {ws}, {we}, {n})"
                          for u, ws, we, n in kv)
        keyed_b.append(
            f"SELECT * FROM (VALUES\n{body})\n"
            f"          t(user_id, ws, we, n)\n"
            f"          WHERE (SELECT count(*) FROM events) = {n_events}")
        klv = keyless_windows(con, sf_dir)
        kbody = ",\n".join(f"            ({ws}, {we}, {n})"
                           for ws, we, n in klv)
        keyless_b.append(
            f"SELECT * FROM (VALUES\n{kbody})\n"
            f"          t(ws, we, n)\n"
            f"          WHERE (SELECT count(*) FROM events) = {n_events}")
        print(f"{sf_dir}: {len(kv)} keyed, {len(klv)} keyless windows")

    keyed_sql = ('    """SELECT CAST(user_id AS BIGINT) AS user_id,\n'
                 "            CAST(ws AS BIGINT) AS _wstart_ms,\n"
                 "            CAST(we AS BIGINT) AS _wend_ms,\n"
                 "            CAST(n AS BIGINT) AS n\n"
                 "          FROM (\n          "
                 + "\n          UNION ALL\n          ".join(keyed_b)
                 + ") u\n"
                 '          ORDER BY user_id, _wstart_ms"""')
    keyless_sql = ('    """SELECT CAST(ws AS BIGINT) AS _wstart_ms,\n'
                   "            CAST(we AS BIGINT) AS _wend_ms,\n"
                   "            CAST(n AS BIGINT) AS n\n"
                   "          FROM (\n          "
                   + "\n          UNION ALL\n          ".join(keyless_b)
                   + ") u\n"
                   '          ORDER BY _wstart_ms, _wend_ms, n"""')
    src = open(OUT).read()
    src = splice(src, "sfEventTrueForLimits", keyed_sql)
    src = splice(src, "sfEventTrueForLimitsKeyless", keyless_sql)
    open(OUT, "w").write(src)
    print(f"spliced into {OUT}")


if __name__ == "__main__":
    main(sys.argv[1:])
