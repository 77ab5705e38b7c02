"""Date arithmetic and solar geometry.

Reference: util/module_date_utilities.F (geth_newdate :3-436, geth_idts
:438-825) and CALC_DECLIN
(driver/module_hrldas_noahmp_driver.F90:813-863).

Date strings use the HRLDAS format ``YYYY-MM-DD_HH:MM:SS``.  Date math
runs on the host (it steers file I/O, never the device); COSZ/JULIAN are
vectorized numpy so the driver can compute them for a whole grid per
step and ship one array to the device.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

FMT = "%Y-%m-%d_%H:%M:%S"


def parse_date(s: str) -> _dt.datetime:
    return _dt.datetime.strptime(s[:19], FMT)


def format_date(d: _dt.datetime) -> str:
    return d.strftime(FMT)


def geth_newdate(date: str, seconds: int) -> str:
    """Advance a date string by a number of seconds (geth_newdate)."""
    return format_date(parse_date(date) + _dt.timedelta(seconds=seconds))


def geth_idts(newdate: str, olddate: str) -> int:
    """Seconds from olddate to newdate (geth_idts)."""
    a = _dt.datetime.strptime(newdate[:10], "%Y-%m-%d") \
        if len(newdate) == 10 else parse_date(newdate)
    b = _dt.datetime.strptime(olddate[:10], "%Y-%m-%d") \
        if len(olddate) == 10 else parse_date(olddate)
    d = a - b
    return int(d.total_seconds()) if len(newdate) > 10 else d.days


def yearlen(year: int) -> int:
    """Days in year (driver leap rule :357-366)."""
    if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0):
        return 366
    return 365


def declin_scalars(nowdate: str):
    """Per-step scalar half of CALC_DECLIN (:813-863): solar
    declination sin/cos, fractional julian day, and UTC hour-of-day.

    The per-column half (local hour angle from longitude, cosz from
    latitude) runs ON DEVICE in the chunked driver: cosz =
    sinlat*sindecl + coslat*cosdecl*cos(hrang) with hrang =
    15*(mod(gmt + lon/15 + 24, 24) - 12)*degrad, using device-resident
    sin(lat)/cos(lat)/lon15.  Returns float32 (sindecl, cosdecl,
    julian, gmt)."""
    degrad = 3.14159265 / 180.0
    dpd = 360.0 / 365.0
    d = parse_date(nowdate)
    iday = (d.date() - _dt.date(d.year, 1, 1)).days
    julian = float(iday) + d.hour / 24.0
    obecl = 23.5 * degrad
    sinob = np.sin(obecl)
    if julian >= 80.0:
        sxlong = dpd * (julian - 80.0) * degrad
    else:
        sxlong = dpd * (julian + 285.0) * degrad
    declin = np.arcsin(sinob * np.sin(sxlong))
    gmt = d.hour + d.minute / 60.0 + d.second / 3600.0
    return (np.float32(np.sin(declin)), np.float32(np.cos(declin)),
            np.float32(julian), np.float32(gmt))


def calc_declin(nowdate: str, latitude, longitude):
    """Cosine solar zenith + fractional julian day (CALC_DECLIN
    :813-863): fixed 23.5-degree obliquity, local solar hour angle.

    latitude/longitude in DEGREES (as read from the domain file);
    vectorized over arrays.  Returns (cosz, julian) as float32.
    """
    degrad = 3.14159265 / 180.0
    dpd = 360.0 / 365.0
    d = parse_date(nowdate)
    iday = (d.date() - _dt.date(d.year, 1, 1)).days
    julian = float(iday) + d.hour / 24.0

    obecl = 23.5 * degrad
    sinob = np.sin(obecl)
    if julian >= 80.0:
        sxlong = dpd * (julian - 80.0) * degrad
    else:
        sxlong = dpd * (julian + 285.0) * degrad
    declin = np.arcsin(sinob * np.sin(sxlong))

    lat = np.asarray(latitude, np.float32)
    lon = np.asarray(longitude, np.float32)
    tloctim = d.hour + d.minute / 60.0 + d.second / 3600.0 + lon / 15.0
    tloctim = np.mod(tloctim + 24.0, 24.0)
    hrang = 15.0 * (tloctim - 12.0) * degrad
    cosz = (np.sin(lat * degrad) * np.sin(declin)
            + np.cos(lat * degrad) * np.cos(declin) * np.cos(hrang))
    return cosz.astype(np.float32), np.float32(julian)
