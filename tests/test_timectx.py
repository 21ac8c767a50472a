"""Calendar helpers vs Python's datetime (reference TimeContext.cpp)."""

import datetime

from shud_tpu.utils.timectx import TimeContext, civil_from_days, days_from_civil


def test_roundtrip_against_datetime():
    epoch = datetime.date(1970, 1, 1)
    for date in (datetime.date(2000, 2, 29), datetime.date(1999, 12, 31),
                 datetime.date(2026, 8, 17), datetime.date(1900, 3, 1),
                 datetime.date(2100, 2, 28)):
        z = (date - epoch).days
        assert days_from_civil(date.year, date.month, date.day) == z
        assert civil_from_days(z) == (date.year, date.month, date.day)


def test_timecontext_iso_and_doy():
    tc = TimeContext(20000101)
    assert tc.iso(0.0) == "2000-01-01 00:00:00"
    assert tc.iso(1440.0 + 90.5) == "2000-01-02 01:30:30"
    assert tc.yyyymmdd(31 * 1440.0) == 20000201
    assert tc.day_of_year(0.0) == 1
    assert tc.day_of_year(59 * 1440.0) == 60  # Feb 29 of leap year
    # julian day of 2000-01-01 00:00 UTC is 2451544.5
    assert abs(tc.julian_day(0.0) - 2451544.5) < 1e-9
    assert tc.epoch_minutes(0.0) == 10957 * 1440.0
