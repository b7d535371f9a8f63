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


def main(sf_dir, keyless=False):
    con = duckdb.connect()
    if keyless:
        # one GLOBAL series over (ts, event_id) — the keyless route's
        # machine-input order (GlobalScan sorts by _ts then the tie)
        rows = con.execute(
            f"""SELECT epoch_us(ts), value
                FROM read_parquet('{sf_dir}/events.parquet')
                WHERE user_id < {MAX_UID}
                ORDER BY ts, event_id""").fetchall()
        vals = sorted((ws // 1000, we // 1000, n)
                      for ws, we, n in windows_for(rows))
        print(f"-- {len(vals)} keyless windows")
        print(",\n".join(
            f"            ({ws}, {we}, {n})" for ws, we, n in vals))
        return
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
    print(f"-- {len(vals)} windows")
    body = ",\n".join(
        f"            ({u}, {ws}, {we}, {n})" for u, ws, we, n in vals)
    print(body)


if __name__ == "__main__":
    main(sys.argv[1], keyless="--keyless" in sys.argv[2:])
