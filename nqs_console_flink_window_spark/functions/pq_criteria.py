"""Perceived-quality scoring criteria, transcribed from the reference config.

Source of truth: /root/reference/nqs-console/src/main/resources/
perceived_quality.xml:25-301 (13 protocols), loaded by score/ParserPQXml.java
and score/PQCfg.java in the reference.  Transcribed here as Python literals
(same content, native format) so the compiler in ``score.py`` needs no XML
parsing at runtime.

Interval notation (perceived_quality.xml:25-45 comment block):
  ``(a,b]`` — a < x <= b;  ``[`` / ``]`` inclusive, ``(`` / ``)`` exclusive;
  ``+`` on either side means unbounded.  ``outlier`` is a comma list of
  ``op:value`` — any match scores the whole record 0 (score/PQMath.java:53-84).

Each band is ``(interval, upper, lower)``: when the metric value x falls in
`interval`, its score interpolates between `lower` and `upper` across the
interval (util/ScoreHelper.java:71-95).
"""

from __future__ import annotations

from dataclasses import dataclass

# Sentinels the reference substitutes for the unbounded '+' sides before
# interpolating (score/Score.java:getMinVal/getMaxVal): Java Float.MIN_VALUE
# and Float.MAX_VALUE/100, widened to double.  Kept bit-identical so the
# interpolation on unbounded bands reproduces the reference's (slightly odd)
# behavior of scoring any in-band value ~= the band's `upper`.
PLUS_MIN = 1.401298464324817e-45  # Float.MIN_VALUE
PLUS_MAX = 3.4028234663852886e36  # Float.MAX_VALUE / 100


@dataclass(frozen=True)
class Band:
    """One <score> row: membership interval + score range."""

    lo: float | None  # None == unbounded '('+',…'
    lo_incl: bool
    hi: float | None  # None == unbounded '…,+)'
    hi_incl: bool
    upper: float
    lower: float

    @property
    def interp_lo(self) -> float:
        return PLUS_MIN if self.lo is None else self.lo

    @property
    def interp_hi(self) -> float:
        return PLUS_MAX if self.hi is None else self.hi


@dataclass(frozen=True)
class Metric:
    name: str
    direction: str  # 'up' (lower is better) | 'down' (higher is better)
    weight: float
    outlier: str  # comma list of op:value, '' if none
    bands: tuple[Band, ...]


@dataclass(frozen=True)
class Criteria:
    protocol: str
    table: str
    metrics: tuple[Metric, ...]


def band(interval: str, upper: float, lower: float) -> Band:
    """Parse the XML interval notation, e.g. ``(0,30]`` / ``[768,+)``."""
    lo_s, hi_s = interval.split(",")
    lo_incl = lo_s.startswith("[")
    hi_incl = hi_s.endswith("]")
    lo_v = lo_s[1:]
    hi_v = hi_s[:-1]
    lo = None if "+" in lo_v else float(lo_v)
    hi = None if "+" in hi_v else float(hi_v)
    return Band(lo, lo_incl, hi, hi_incl, upper, lower)


def _metric(name: str, direction: str, weight: float, outlier: str, *bands_: Band) -> Metric:
    return Metric(name, direction, weight, outlier, tuple(bands_))


# Shared band sets (the XML repeats these verbatim across protocols).
_PING_RTT = (
    band("(0,30]", 100, 90),
    band("(30,100]", 90, 80),
    band("(100,500]", 80, 70),
    band("(500,2000]", 70, 50),
    band("(2000,+)", 50, 0),
)
_LOST_RATE = (
    band("[0,0.01]", 100, 90),
    band("(0.01,0.1]", 90, 80),
    band("(0.1,0.3]", 80, 70),
    band("(0.3,0.7]", 70, 50),
    band("(0.7,100]", 50, 0),
)
_DNS_COST = (
    band("(0,40]", 100, 90),
    band("(40,60]", 90, 80),
    band("(60,100]", 80, 70),
    band("(100,200]", 70, 50),
    band("(200,+)", 50, 0),
)
_CONN_COST = (
    band("(0,60]", 100, 90),
    band("(60,150]", 90, 80),
    band("(150,250]", 80, 70),
    band("(250,400]", 70, 50),
    band("(400,+)", 50, 0),
)
_TEXT_COST = (
    band("(0,800]", 100, 90),
    band("(800,1500]", 90, 80),
    band("(1500,2500]", 80, 70),
    band("(2500,5000]", 70, 50),
    band("(5000,+)", 50, 0),
)
_HTTP_AVG_SPEED = (
    band("[768,+)", 100, 90),
    band("[512,768]", 90, 80),
    band("[256,512]", 80, 70),
    band("(64,256]", 70, 50),
    band("(0,64]", 50, 0),
)
_SERVER_RESP = (
    band("(0,10]", 100, 90),
    band("(10,100]", 90, 80),
    band("(100,500]", 80, 70),
    band("(500,2000]", 70, 50),
    band("(2000,+)", 50, 0),
)
_MAIL_SPEED = (
    band("(1024,+)", 100, 90),
    band("(300,1024]", 90, 80),
    band("(50,300]", 80, 70),
    band("(10,50]", 70, 50),
    band("(0,10]", 50, 0),
)
_SUCCESS_RATE = (
    band("(70,100]", 100, 90),
    band("(30,70]", 90, 80),
    band("(10,30]", 80, 70),
    band("(1,10]", 70, 50),
    band("(0,1]", 50, 0),
)
_FTP_SPEED = (
    band("[6,+)", 100, 90),
    band("[4,6)", 90, 80),
    band("[2,4)", 80, 70),
    band("[0.5,2)", 70, 50),
    band("(0,0.5)", 50, 0),
)

_HTTP_METRICS = (
    _metric("dns_cost", "up", 0.2, "<=:0,>=:1000", *_DNS_COST),
    _metric("conn_cost", "up", 0.2, "<=:0,>=:5000", *_CONN_COST),
    _metric("text_cost", "up", 0.3, "<=:0,>=:20000", *_TEXT_COST),
    _metric("avg_speed", "down", 0.3, "<=:0", *_HTTP_AVG_SPEED),
)
_DNS_METRICS_TIME = (
    _metric("time_cost", "up", 0.1, "<=:0,>=:1000", *_DNS_COST),
    _metric("success_rate", "down", 0.9, "<=:0", *_SUCCESS_RATE),
)

CRITERIA: dict[str, Criteria] = {
    c.protocol: c
    for c in (
        Criteria(
            "PING",
            "gw_ping",
            (
                _metric("rtt", "up", 0.5, "<=:0,>=:5000", *_PING_RTT),
                _metric("lost_rate", "up", 0.5, ">=:100,<=:-1", *_LOST_RATE),
            ),
        ),
        Criteria("HTTP", "gw_http", _HTTP_METRICS),
        Criteria(
            "TCPPING",
            "gw_tcpping",
            (
                _metric("rtt", "up", 0.95, "<=:0,>=:5000", *_PING_RTT),
                _metric("lost_rate", "up", 0.05, ">=:100,<=:-1", *_LOST_RATE),
            ),
        ),
        Criteria(
            "GAME",
            "gw_game",
            (
                _metric(
                    "tcp_delay",
                    "up",
                    0.4,
                    "<=:0,>=:5000",
                    band("(0,50]", 100, 90),
                    band("(50,150]", 90, 80),
                    band("(150,250]", 80, 70),
                    band("(250,500]", 70, 50),
                    band("(500,+)", 50, 0),
                ),
                _metric("rtt", "up", 0.3, "<=:0,>=:5000", *_PING_RTT),
                _metric("conn_cost", "up", 0.3, "<=:0,>=:5000", *_CONN_COST),
            ),
        ),
        Criteria(
            "FLASH",
            "gw_flash",
            (
                _metric("conn_cost", "up", 0.15, "<=:0,>=:5000", *_CONN_COST),
                _metric(
                    "first_byte_cost",
                    "up",
                    0.15,
                    "<=:0,>=:10000",
                    band("(0,200]", 100, 90),
                    band("(200,400]", 90, 80),
                    band("(400,600]", 80, 70),
                    band("(600,1000]", 70, 50),
                    band("(1000,+)", 50, 0),
                ),
                _metric(
                    "pause_count",
                    "up",
                    0.25,
                    "<=:-1,>=:10",
                    band("[0,1]", 100, 90),
                    band("(1,2]", 90, 80),
                    band("(2,3]", 80, 70),
                    band("(3,5]", 70, 50),
                    band("(5,+)", 50, 0),
                ),
                _metric(
                    "carlton_rate",
                    "up",
                    0.20,
                    "<=:-1,>=:100",
                    band("[0,0.1]", 100, 90),
                    band("(0.1,0.2]", 90, 80),
                    band("(0.2,0.3]", 80, 70),
                    band("(0.3,0.5]", 70, 50),
                    band("(0.5,+)", 50, 0),
                ),
                _metric(
                    "avg_speed",
                    "down",
                    0.25,
                    "<=:0",
                    band("[1024,+)", 100, 90),
                    band("[512,1024)", 90, 80),
                    band("[256,512)", 80, 70),
                    band("[64,256)", 70, 50),
                    band("(0,64)", 50, 0),
                ),
            ),
        ),
        Criteria("DNS", "gw_dns", _DNS_METRICS_TIME),
        Criteria(
            "POP3",
            "gw_pop3",
            (
                _metric("conn_cost", "up", 0.5, "<=:0,>=:5000", *_SERVER_RESP),
                _metric("avg_speed", "down", 0.5, "<=:0", *_MAIL_SPEED),
            ),
        ),
        Criteria(
            "SMTP",
            "gw_smtp",
            (
                _metric("conn_cost", "up", 0.5, "<=:0,>=:5000", *_SERVER_RESP),
                _metric("send_speed", "down", 0.5, "<=:0", *_MAIL_SPEED),
            ),
        ),
        Criteria(
            "WECHAT",
            "gw_wechat",
            (
                _metric("conn_cost", "up", 0.5, "<=:0,>=:5000", *_CONN_COST),
                _metric("response_cost", "up", 0.5, "<=:0,>=:5000", *_SERVER_RESP),
            ),
        ),
        Criteria(
            "SPEED",
            "gw_speed",
            (
                # Present in config but ScoreHelper.java:30-33 hard-codes
                # SPEED records to score 0 before consulting the criteria.
                _metric(
                    "bandwidth_ratio",
                    "down",
                    1.0,
                    "<=:0",
                    band("(70,+)", 100, 90),
                    band("(30,70]", 90, 80),
                    band("(10,30]", 80, 70),
                    band("(1,10]", 70, 50),
                    band("(0,1]", 50, 0),
                ),
            ),
        ),
        Criteria(
            "FTP",
            "gw_ftp",
            (
                _metric("download_speed", "down", 0.5, "<=:0", *_FTP_SPEED),
                _metric("upload_speed", "down", 0.5, "<=:0", *_FTP_SPEED),
            ),
        ),
        Criteria("HTTP_DETAIL", "gw_http_detail", _HTTP_METRICS),
        Criteria(
            "DNS_DETAIL",
            "gw_dns_detail",
            (
                _metric("dns_cost", "up", 0.1, "<=:0,>=:1000", *_DNS_COST),
                _metric("success_rate", "down", 0.9, "<=:0", *_SUCCESS_RATE),
            ),
        ),
        Criteria("DNS_RESOLUTION_DETAIL", "gw_dns_resolution_detail", _DNS_METRICS_TIME),
    )
}
