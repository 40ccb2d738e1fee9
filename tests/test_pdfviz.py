"""S8 annotated-PDF sink: structural validity (the file parses from its
own xref), layer parity with the SVG form, y-flip round-trip, and the
failure path."""

import re

import pytest

from pdftotext_plus_plus_spark import fixtures, pdfviz, pipeline

UNITS = ("characters", "words", "lines", "blocks", "page_segments",
         "figures", "shapes", "graphics", "reading_order",
         "segment_cuts", "reading_order_cuts")


def _extract(family: str, idx: int = 0, units=UNITS):
    import random

    rng = random.Random(42 * 1000003 + idx)
    html, _, pages = fixtures.build_family_pages(family, rng)
    res = pipeline.extract(html, svg_units=units, pdf_units=units,
                           keep_doc=True)
    assert res.parse_failure_code == 0
    return res, pages


def _check_xref(pdf: str) -> int:
    """Validate header/xref/trailer; every xref offset must point at its
    numbered object.  Returns the object count."""
    assert pdf.startswith("%PDF-1.4\n")
    assert pdf.rstrip().endswith("%%EOF")
    startxref = int(pdf.rstrip().split("\n")[-2])
    assert pdf[startxref:startxref + 4] == "xref"
    offsets = re.findall(r"^(\d{10}) 00000 n ", pdf[startxref:], re.M)
    assert offsets
    for i, off in enumerate(offsets, start=1):
        assert pdf[int(off):].startswith("%d 0 obj" % i), i
    n = int(re.search(r"/Size (\d+)", pdf).group(1))
    assert n == len(offsets) + 1
    return len(offsets)


def test_pdf_structure_and_stream_lengths():
    res, _ = _extract("figures")
    pdf = res.pdf
    n_obj = _check_xref(pdf)
    n_pages = len(res.doc.pages)
    # 1 catalog + 1 pages + 1 font + (page dict + content) per page
    assert n_obj == 3 + 2 * n_pages
    # every /Length matches the exact bytes between stream markers
    for m in re.finditer(r"<</Length (\d+)>>\nstream\n", pdf):
        ln = int(m.group(1))
        body = pdf[m.end():m.end() + ln]
        assert pdf[m.end() + ln:m.end() + ln + 10] == "\nendstream"
        assert "endstream" not in body


def test_pdf_layer_parity_with_svg():
    """Same corpus, same units: the PDF draws exactly as many element
    rects per unit layer as the SVG — the two S8 forms carry identical
    layer content."""
    for family in ("figures", "two-col", "enumerations"):
        res, _ = _extract(family)
        svg, pdf = res.svg, res.pdf
        for unit in ("characters", "words", "blocks", "figures", "shapes"):
            svg_layer = re.findall(
                r'<g class="%s">(.*?)</g>' % unit, svg, re.S)
            svg_rects = sum(s.count("<rect") for s in svg_layer)
            pdf_layer = re.findall(
                r'/Unit <</Name \(%s\) /Page \d+>> BDC\n(.*?)\nEMC'
                % unit, pdf, re.S)
            pdf_rects = sum(len(re.findall(r"\bre S\b", s))
                            for s in pdf_layer)
            if unit == "blocks":
                # the SVG blocks layer has 1 rect per block (+1 text);
                # the PDF likewise 1 re S per block (+1 Tj)
                pdf_labels = sum(s.count("Tj") for s in pdf_layer)
                assert pdf_labels == pdf_rects
            assert pdf_rects == svg_rects, (family, unit)
        # reading order: same number of polyline segments and index texts
        svg_ro = svg.count('<line class="reading-order"')
        pdf_ro = sum(s.count(" l S")
                     for s in re.findall(
                         r'/Unit <</Name \(reading_order\).*?>> BDC\n(.*?)\nEMC',
                         pdf, re.S))
        assert pdf_ro == svg_ro, family
        # cuts: candidate lines + chosen squares match
        for unit in ("segment_cuts", "reading_order_cuts"):
            svg_layer = "".join(re.findall(
                r'<g class="%s">(.*?)</g>' % unit, svg, re.S))
            pdf_layer = "".join(re.findall(
                r'/Unit <</Name \(%s\) /Page \d+>> BDC\n(.*?)\nEMC'
                % unit, pdf, re.S))
            assert (pdf_layer.count(" l S")
                    == svg_layer.count('<line class="cut'))
            assert (pdf_layer.count("re f")
                    == svg_layer.count("cut-index-box"))


def test_pdf_yflip_roundtrip():
    """figures/shapes rect geometry round-trips through the PDF's
    bottom-left coordinates back to the construction boxes at %.1f."""
    res, pages = _extract("figures")
    pdf = res.pdf
    rx = (r'/Elem <</Id \(([a-z]+-(\d+)-\d+)\)>> BDC\n'
          r'([-\d.]+) ([-\d.]+) ([-\d.]+) ([-\d.]+) re S')
    got = {m.group(1): tuple(float(m.group(i)) for i in (3, 4, 5, 6))
           for m in re.finditer(rx, pdf)}
    want = {}
    for page in pages:
        h = page["clip"][3]
        for kind_key, kind in (("figures", "figure"), ("shapes", "shape")):
            for j, (lx, uy, rxx, ly) in enumerate(page.get(kind_key, [])):
                want["%s-%d-%d" % (kind, page["page_num"], j)] = (
                    float("%.1f" % lx), float("%.1f" % (h - ly)),
                    float("%.1f" % (rxx - lx)), float("%.1f" % (ly - uy)))
    assert got == want


def test_pdf_failure_path():
    res = pipeline.extract(b"\x00corrupt", pdf_units=("blocks",))
    assert res.parse_failure_code != 0
    assert res.pdf == ""


def test_pdf_unknown_unit_raises():
    res, _ = _extract("figures", units=("blocks",))
    with pytest.raises(ValueError):
        pdfviz.serialize_pdf(res.doc, units=("not-a-unit",))
    assert pdfviz.serialize_pdf(None) == ""
