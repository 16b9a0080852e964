"""Real-pixel validation of the scanned-PDF OCR seam (VERDICT r12 task 4).

No OCR engine ships in this container (no tesseract/PIL/easyocr — probed),
so the seam is proven with sources/rasterocr: text rendered to an 8-bit
grayscale raster glyph by glyph, decoded back by nearest-template Hamming
matching over thresholded pixels — segmentation + classification + noise
margin, the math a real engine's matcher runs.  The engine plugs into the
SAME ``extract_pdf_pages(ocr=)`` slot as ``ocr_stub`` and pytesseract
would (the test_real_encoder seam pattern)."""

import random

import pytest

from memory_opensource_spark.sources import rasterocr as R
from memory_opensource_spark.sources.pdf import (
    extract_pdf_pages,
    ocr_stub,
    write_pdf,
)


class TestTemplates:
    def test_deterministic_across_rebuilds(self):
        assert R._build_templates() == R._TEMPLATES

    def test_min_pairwise_distance(self):
        items = list(R._TEMPLATES.items())
        for i, (_, a) in enumerate(items):
            for _, b in items[i + 1:]:
                assert bin(a ^ b).count("1") >= R._MIN_DIST

    def test_space_is_blank(self):
        assert R._TEMPLATES[" "] == 0


class TestRenderDecode:
    def test_round_trip_plain(self):
        text = "HELLO SCANNED WORLD 123"
        img = R.render_text_image(text)
        assert len(img) % R.IMAGE_W == 0
        assert R.raster_ocr(img) == text

    def test_round_trip_multiline_and_punctuation(self):
        text = "Invoice #42: total $17.50\n\nsigned, QA-bot (v2)"
        assert R.raster_ocr(R.render_text_image(text)) == text

    def test_long_line_wraps(self):
        text = "A" * 100
        out = R.raster_ocr(R.render_text_image(text))
        assert out == "A" * 64 + "\n" + "A" * 36

    def test_noise_tolerance(self):
        """Scanner noise: flip pixels to mid-gray across the raster — the
        nearest-template match must still decode every glyph while the
        damage stays under half the template separation (< _MIN_DIST/2
        ink-bit errors per glyph)."""
        text = "NOISY SCAN 7"
        img = bytearray(R.render_text_image(text))
        rng = random.Random(13)
        # corrupt 3 pixels inside every glyph cell of the first row
        for g in range(len(text)):
            for _ in range(3):
                py, px = rng.randrange(R.GLYPH_H), rng.randrange(R.GLYPH_W)
                off = py * R.IMAGE_W + g * R.CELL_W + px
                img[off] = 0x00 if img[off] == 0xFF else 0xFF
        assert R.raster_ocr(bytes(img)) == text

    def test_threshold_is_real(self):
        # grayscale, not byte-equality: dim ink (100) and dirty paper (200)
        img = bytearray(R.render_text_image("GRAY"))
        for i, b in enumerate(img):
            img[i] = 100 if b < 128 else 200
        assert R.raster_ocr(bytes(img)) == "GRAY"

    def test_rejects_foreign_scan_format(self):
        # the marker-format scan must NOT silently decode as garbage text
        with pytest.raises(ValueError, match="not a rasterocr scan"):
            R.raster_ocr(b"scan: some marker payload")

    def test_unknown_chars_render_as_unknown(self):
        assert R.raster_ocr(R.render_text_image("AéB")) == "A?B"


class TestPdfSeam:
    def test_scanned_pdf_round_trips_through_raster_ocr(self):
        pages = ["FIRST SCANNED PAGE", "text layer page",
                 "THIRD: 99 BOTTLES"]
        data = write_pdf(pages, scanned={0, 2}, scan_raster=True)
        # without an engine the scanned pages stay honestly empty
        assert extract_pdf_pages(data) == ["", "text layer page", ""]
        # with the raster engine the full document round-trips
        assert extract_pdf_pages(data, ocr=R.raster_ocr) == pages

    def test_uncompressed_raster_also_round_trips(self):
        data = write_pdf(["RAW PIXELS"], scanned=True, scan_raster=True,
                         compress=False)
        assert extract_pdf_pages(data, ocr=R.raster_ocr) == ["RAW PIXELS"]

    def test_raster_dimensions_published_in_xobject(self):
        data = write_pdf(["DIMS"], scanned=True, scan_raster=True)
        assert b"/Width " + str(R.IMAGE_W).encode() in data
        assert b"/Width 612" not in data

    def test_marker_and_raster_engines_share_the_seam(self):
        """Same ocr= slot, two engines: each decodes its own format —
        the seam contract (Callable[[bytes], str]) is unchanged."""
        marker = write_pdf(["both ways"], scanned=True)
        raster = write_pdf(["BOTH WAYS"], scanned=True, scan_raster=True)
        assert extract_pdf_pages(marker, ocr=ocr_stub) == ["both ways"]
        assert extract_pdf_pages(raster, ocr=R.raster_ocr) == ["BOTH WAYS"]

    def test_spark_kernel_with_raster_engine(self, spark):
        """The mapInPandas kernel accepts the raster engine through the
        same slot the oracle row uses for ocr_stub."""
        import pandas as pd

        from memory_opensource_spark.sources.pdf import (
            make_pdf_extract_kernel)

        blobs = [(f"doc{i}", write_pdf([f"PAGE {i}"], scanned=True,
                                       scan_raster=True))
                 for i in range(4)]
        df = spark.createDataFrame(blobs, "path string, content binary")
        kernel = make_pdf_extract_kernel(ocr=R.raster_ocr)
        out = df.mapInPandas(kernel, schema=(
            "path string, page int, total_pages int, text string, "
            "error string")).toPandas().sort_values("path")
        assert list(out.text) == [f"PAGE {i}" for i in range(4)]
        assert out.error.isna().all() or (out.error == None).all()  # noqa: E711
        assert isinstance(out, pd.DataFrame)
