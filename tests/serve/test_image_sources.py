"""ImageFetcher tests: path / store:// / CoralNet-ID resolution, the
suffix-preserving cache, and the image-view HTML parse — with an offline
fake transport (reference analog: annotation.py:342-387)."""

import io
import unittest
from pathlib import Path

import numpy as np

from mermaid_classifier_tpu.serve.image_sources import (
    ImageFetcher,
    _OriginalImageParser,
)


def png_bytes(value: int, size: int = 8) -> bytes:
    from PIL import Image

    arr = np.full((size, size, 3), value, dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class FakeTransport:
    """Offline stand-in for the CoralNet scrape: records calls, serves a
    deterministic image per ID."""

    def __init__(self):
        self.calls: list[int] = []

    def __call__(self, image_id: int):
        self.calls.append(image_id)
        return png_bytes(image_id % 256), ".png"


class TestSpecResolution(unittest.TestCase):
    def test_local_path(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            path = Path(td) / "reef.png"
            path.write_bytes(png_bytes(7))
            image = ImageFetcher().fetch(str(path))
            self.assertEqual(image.shape, (8, 8, 3))
            self.assertTrue((image == 7).all())

    def test_digit_named_local_file_wins_over_coralnet_id(self):
        """An existing all-digits file reads locally — it must never
        trigger the CoralNet transport (zero-egress environments)."""
        import os
        import tempfile

        def refuse(image_id):
            raise AssertionError("transport must not be called")

        with tempfile.TemporaryDirectory() as td:
            path = Path(td) / "00123"
            path.write_bytes(png_bytes(5))
            cwd = os.getcwd()
            os.chdir(td)
            try:
                image = ImageFetcher(coralnet_transport=refuse).fetch("00123")
            finally:
                os.chdir(cwd)
            self.assertTrue((image == 5).all())

    def test_store_uri(self):
        import tempfile

        from mermaid_classifier_tpu.data.store import LocalFSObjectStore

        with tempfile.TemporaryDirectory() as td:
            store = LocalFSObjectStore(td)
            store.put_bytes("imgs", "s1/i9.png", png_bytes(9))
            fetcher = ImageFetcher(store=store)
            image = fetcher.fetch("store://imgs/s1/i9.png")
            self.assertTrue((image == 9).all())

    def test_coralnet_id_uses_transport(self):
        transport = FakeTransport()
        fetcher = ImageFetcher(coralnet_transport=transport)
        image = fetcher.fetch(123)
        self.assertEqual(transport.calls, [123])
        self.assertTrue((image == 123).all())
        # String-of-digits spec means the same thing.
        fetcher.fetch("123")
        self.assertEqual(transport.calls, [123, 123])


class TestCoralnetCache(unittest.TestCase):
    def test_download_populates_cache_and_second_fetch_skips_transport(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            transport = FakeTransport()
            fetcher = ImageFetcher(
                cache_dir=Path(td) / "cache", coralnet_transport=transport
            )
            fetcher.fetch(42)
            self.assertEqual(transport.calls, [42])
            # Suffix-preserving cache entry (reference: i<id><suffix>).
            self.assertTrue((Path(td) / "cache" / "i42.png").is_file())
            image = fetcher.fetch(42)
            self.assertEqual(transport.calls, [42])  # no second download
            self.assertTrue((image == 42).all())

    def test_cache_lookup_is_by_stem_any_suffix(self):
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            cache = Path(td)
            (cache / "i7.jpeg").write_bytes(png_bytes(7))  # decoded by content
            transport = FakeTransport()
            fetcher = ImageFetcher(cache_dir=cache, coralnet_transport=transport)
            image = fetcher.fetch(7)
            self.assertEqual(transport.calls, [])
            self.assertTrue((image == 7).all())


class TestImageViewParser(unittest.TestCase):
    def test_extracts_original_image_src(self):
        html = """
        <html><body>
        <div id="thumbnails"><img src="/thumb.png"></div>
        <div id="original_image_container">
          <div class="inner"><img src="https://cdn.example/full_i5.jpg"></div>
        </div>
        </body></html>
        """
        parser = _OriginalImageParser()
        parser.feed(html)
        self.assertEqual(parser.image_url, "https://cdn.example/full_i5.jpg")

    def test_no_container_yields_none(self):
        parser = _OriginalImageParser()
        parser.feed("<html><img src='/x.png'></html>")
        self.assertIsNone(parser.image_url)


class TestAnnotationRunWithFetcher(unittest.TestCase):
    def test_coralnet_id_spec_end_to_end(self):
        """AnnotationRun resolves a CoralNet-ID image through the injected
        fetcher — the structurally-complete offline path."""
        import tempfile

        from mermaid_classifier_tpu.inference.loader import Predictor
        from mermaid_classifier_tpu.serve.annotation import AnnotationRun

        predictor = Predictor(
            lambda arr: np.tile([0.75, 0.25], (len(arr), 1)),
            ["a::", "b::"],
            input_dim=4,
        )

        class StubExtractor:
            def extract_features(self, image, rowcols):
                assert image.shape[2] == 3
                return np.ones((len(rowcols), 4), np.float32)

        with tempfile.TemporaryDirectory() as td:
            points = Path(td) / "points.csv"
            points.write_text("row,col\n2,3\n4,5\n")
            run = AnnotationRun(
                "314",
                points,
                predictor,
                extractor=StubExtractor(),
                fetcher=ImageFetcher(coralnet_transport=FakeTransport()),
            )
            predictions = run.run()
            self.assertEqual(len(predictions), 2)
            self.assertEqual(predictions[0].labels[0], "a::")
            self.assertEqual(run.summary()["image"], "314")


if __name__ == "__main__":
    unittest.main()
