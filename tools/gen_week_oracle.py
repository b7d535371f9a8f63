#!/usr/bin/env python3
"""Regenerate the pinned oracle rows for dialect_week_modes.

Implements the reference's WEEK(ts, mode) semantics (MySQL-compatible;
sclfunc.c:5073 calculateWeekNum + :5109 weekMode, flag bits in
sclInt.h:89-91) independently in Python and prints VALUES rows
(day_us, w0..w7) for the events table's January 2024 span.
"""
import datetime


def week(d, mode0):
    mode = mode0 if (mode0 & 1) else mode0 ^ 4
    monday_first = bool(mode & 1)
    from_one = bool(mode & 2)
    first_weekday = bool(mode & 4)
    epoch_day = d.toordinal() - datetime.date(1970, 1, 1).toordinal()
    year = d.year
    jan1 = datetime.date(year, 1, 1)
    first_day_num = jan1.toordinal() - datetime.date(1970, 1, 1).toordinal()

    def wd(daynr):
        return (daynr + (3 if monday_first else 4)) % 7

    def head_week_is_one(w):
        return w == 0 if first_weekday else w < 4

    weekday = wd(first_day_num)
    if d.month == 1 and d.day <= 7 - weekday:
        if not from_one and not head_week_is_one(weekday):
            return 0
        from_one = True
        year -= 1
        days_prev = 366 if datetime.date(year, 12, 31).toordinal() \
            - datetime.date(year, 1, 1).toordinal() == 365 else 365
        first_day_num -= days_prev
        weekday = (weekday + 53 * 7 - days_prev) % 7
    if not head_week_is_one(weekday):
        days = epoch_day - (first_day_num + (7 - weekday))
    else:
        days = epoch_day - (first_day_num - weekday)
    if from_one and days >= 52 * 7:
        year_days = 366 if datetime.date(year, 12, 31).toordinal() \
            - datetime.date(year, 1, 1).toordinal() == 365 else 365
        if head_week_is_one((weekday + year_days) % 7):
            return 1
    return days // 7 + 1


if __name__ == "__main__":
    t0 = datetime.date(2024, 1, 1)
    for i in range(31):
        d = t0 + datetime.timedelta(days=i)
        us = (d.toordinal() - datetime.date(1970, 1, 1).toordinal()) \
            * 86400000000
        ws = ", ".join(str(week(d, m)) for m in range(8))
        print(f"            ({us}, {ws}),")
