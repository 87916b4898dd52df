"""Runtime loader for the perceived-quality criteria XML.

The reference parses ``perceived_quality.xml`` at startup with jsoup
(score/ParserPQXml.java:18-70: criteria -> metric -> score elements, all
attribute-driven).  This repo ships the same config file at
``resources/perceived_quality.xml`` (config DATA, attributed — see
``pq_criteria.py``), and this module is the Python analogue of that parser:
it produces the exact ``dict[str, Criteria]`` that ``pq_criteria.CRITERIA``
transcribes, and ``tests/test_score.py`` asserts the two are equal — so the
hand transcription can never drift from the config.

jsoup note: the XML is NOT well-formed — ``outlier="<=:0,>=:5000"`` embeds
raw ``<``/``>`` inside attribute values, which jsoup tolerates but
ElementTree rejects.  ``_lenient_source`` escapes angle brackets inside
quoted attribute values (the only ill-formedness present) before parsing.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from pathlib import Path

from .pq_criteria import Band, Criteria, Metric, band

DEFAULT_XML = Path(__file__).resolve().parent.parent / "resources" / "perceived_quality.xml"

_ATTR = re.compile(r'="([^"]*)"')


def _lenient_source(text: str) -> str:
    """Escape raw angle brackets inside attribute values (jsoup-lenient)."""
    return _ATTR.sub(
        lambda m: '="' + m.group(1).replace("<", "&lt;").replace(">", "&gt;") + '"',
        text,
    )


def _float(s: str) -> float:
    """Decimal attribute string -> double.

    Precision note: the reference stores these via ``Float.valueOf`` (float32
    — ParserPQXml.java:46,66-67), so its effective weight for "0.2" is
    0.20000000298…; this engine computes in float64 of the decimal literal
    (0.2).  Band edges / upper / lower are all float32-exact integers, so
    only the *weights* differ, by <= 2^-23 relative — absorbed by the final
    round() of the weighted sum (SURVEY §7.4 risk 1, same bucket as the
    HALF_UP rounding delta).  The transcription in ``pq_criteria.py`` uses
    the same double-of-decimal convention, so parity here is exact."""
    return float(s)


def parse_criteria(xml_path: str | Path = DEFAULT_XML) -> dict[str, Criteria]:
    """criteria -> metric -> score, keyed by protocol (ParserPQXml.java)."""
    text = Path(xml_path).read_text(encoding="utf-8")
    root = ET.fromstring(_lenient_source(text))
    out: dict[str, Criteria] = {}
    for c in root.iter("criteria"):
        metrics: list[Metric] = []
        for m in c.iter("metric"):
            bands: list[Band] = []
            for s in m.iter("score"):
                bands.append(
                    band(
                        (s.text or "").strip(),
                        _float(s.attrib["upper"]),
                        _float(s.attrib["lower"]),
                    )
                )
            metrics.append(
                Metric(
                    name=m.attrib["name"],
                    direction=m.attrib["direction"],
                    weight=_float(m.attrib["weight"]),
                    outlier=m.attrib.get("outlier", ""),
                    bands=tuple(bands),
                )
            )
        proto = c.attrib["protocol"]
        out[proto] = Criteria(proto, c.attrib["table"], tuple(metrics))
    return out
