"""S3ObjectStore tests against an in-process fake endpoint, plus the SigV4
signer pinned to the published AWS test vector."""

import datetime
import unittest

from mermaid_classifier_tpu.data.s3_store import (
    S3Credentials,
    S3ObjectStore,
    sign_request,
)
from mermaid_classifier_tpu.data.store import ObjectStoreError, download_parallel

from tests.data.fake_s3_server import make_server


class TestSigV4Vector(unittest.TestCase):
    def test_aws_published_get_vanilla_query_vector(self):
        """The 'get-vanilla-query-order-key-case' style example from the
        AWS SigV4 documentation (service=iam): a known request must produce
        the exact published signature."""
        creds = S3Credentials(
            access_key="AKIDEXAMPLE",
            secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        )
        headers = sign_request(
            "GET",
            "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
            {
                "content-type": "application/x-www-form-urlencoded;"
                " charset=utf-8"
            },
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
            credentials=creds,
            region="us-east-1",
            service="iam",
            now=datetime.datetime(
                2015, 8, 30, 12, 36, 0, tzinfo=datetime.timezone.utc
            ),
        )
        self.assertIn(
            "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400"
            "e06b5924a6f2b5d7",
            headers["Authorization"],
        )
        self.assertEqual(headers["x-amz-date"], "20150830T123600Z")
        self.assertIn(
            "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request",
            headers["Authorization"],
        )

    def test_session_token_is_signed_in(self):
        creds = S3Credentials("AK", "SK", session_token="TOK")
        headers = sign_request(
            "GET",
            "https://bucket.example/key",
            {},
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
            credentials=creds,
            region="us-east-1",
        )
        self.assertEqual(headers["x-amz-security-token"], "TOK")
        self.assertIn("x-amz-security-token", headers["Authorization"])


class FakeEndpointCase(unittest.TestCase):
    def setUp(self):
        self.server, self.state, endpoint = make_server()
        self.addCleanup(self.server.shutdown)
        self.store = S3ObjectStore(
            endpoint,
            credentials=S3Credentials("AK", "SK"),
            retry_backoff_s=0.01,
        )


class TestS3StoreRoundTrip(FakeEndpointCase):
    def test_put_get_exists_delete(self):
        self.assertFalse(self.store.exists("feat", "a/b.npz"))
        self.store.put_bytes("feat", "a/b.npz", b"\x00\x01payload")
        self.assertTrue(self.store.exists("feat", "a/b.npz"))
        self.assertEqual(self.store.get_bytes("feat", "a/b.npz"), b"\x00\x01payload")
        self.store.delete("feat", "a/b.npz")
        self.assertFalse(self.store.exists("feat", "a/b.npz"))

    def test_get_missing_raises(self):
        with self.assertRaisesRegex(ObjectStoreError, "not found"):
            self.store.get_bytes("feat", "missing.npz")

    def test_requests_carry_sigv4_auth(self):
        self.store.put_bytes("feat", "k", b"x")
        self.assertTrue(self.state.auth_headers)
        for auth in self.state.auth_headers:
            self.assertIsNotNone(auth)
            self.assertIn("AWS4-HMAC-SHA256", auth)

    def test_anonymous_store_sends_unsigned(self):
        anon = S3ObjectStore(
            self.store.endpoint, credentials=None, retry_backoff_s=0.01
        )
        anon.put_bytes("feat", "k", b"x")
        self.assertIsNone(self.state.auth_headers[-1])

    def test_keys_with_special_characters(self):
        key = "source 12/image=5+6.features.npz"
        self.store.put_bytes("feat", key, b"data")
        self.assertTrue(self.store.exists("feat", key))
        self.assertEqual(self.store.get_bytes("feat", key), b"data")
        self.assertIn(key, list(self.store.list_keys("feat")))


class TestS3StoreListing(FakeEndpointCase):
    def test_list_with_prefix_and_pagination(self):
        self.state.max_keys = 3  # force several pages
        for i in range(10):
            self.store.put_bytes("feat", f"s1/img{i:02d}.npz", b"d")
        self.store.put_bytes("feat", "s2/other.npz", b"d")
        keys = list(self.store.list_keys("feat", prefix="s1/"))
        self.assertEqual(keys, [f"s1/img{i:02d}.npz" for i in range(10)])
        # Pagination actually happened: several list requests went out.
        list_requests = [
            p for (m, p) in self.state.requests if "list-type=2" in p
        ]
        self.assertGreaterEqual(len(list_requests), 4)

    def test_empty_listing(self):
        self.assertEqual(list(self.store.list_keys("feat")), [])


class TestS3StoreRetries(FakeEndpointCase):
    def test_transient_500s_are_retried(self):
        self.store.put_bytes("feat", "k", b"v")
        self.state.failures_remaining = 2
        self.assertEqual(self.store.get_bytes("feat", "k"), b"v")

    def test_exhausted_retries_raise(self):
        self.state.failures_remaining = 99
        with self.assertRaises(ObjectStoreError):
            self.store.get_bytes("feat", "k")


class TestS3StoreAsDataPlane(FakeEndpointCase):
    def test_download_parallel_against_s3(self):
        import tempfile
        from pathlib import Path

        for i in range(6):
            self.store.put_bytes("feat", f"img{i}.npz", f"payload{i}".encode())
        with tempfile.TemporaryDirectory() as td:
            jobs = {
                ("feat", f"img{i}.npz"): str(Path(td) / f"img{i}.npz")
                for i in range(6)
            }
            jobs[("feat", "missing.npz")] = str(Path(td) / "missing.npz")
            failed = download_parallel(self.store, jobs, max_workers=4)
            self.assertEqual(failed, {("feat", "missing.npz")})
            for i in range(6):
                self.assertEqual(
                    (Path(td) / f"img{i}.npz").read_bytes(), f"payload{i}".encode()
                )

    def test_bucket_resume_discipline(self):
        """The bucket listing is the source of truth for progress: keys
        written before a 'crash' are visible to the next worker, which
        skips them (reference: build_feature_bucket.py:15-22,337-349)."""
        done = {"s1/img0.features.npz", "s1/img2.features.npz"}
        for key in done:
            self.store.put_bytes("feat", key, b"features")
        existing = set(self.store.list_keys("feat", prefix="s1/"))
        self.assertEqual(existing, done)
        todo = [
            f"s1/img{i}.features.npz"
            for i in range(4)
            if f"s1/img{i}.features.npz" not in existing
        ]
        self.assertEqual(
            todo, ["s1/img1.features.npz", "s1/img3.features.npz"]
        )


class TestDefaultStoreResolution(unittest.TestCase):
    def test_s3_root_returns_s3_backend(self):
        import os
        from unittest import mock

        from mermaid_classifier_tpu.config import settings as settings_mod
        from mermaid_classifier_tpu.data.store import get_default_store

        with mock.patch.dict(
            os.environ,
            {
                "OBJECT_STORE_ENDPOINT": "http://127.0.0.1:1",
                "AWS_REGION": "eu-west-2",
                "AWS_ACCESS_KEY_ID": "AK",
                "AWS_SECRET_ACCESS_KEY": "SK",
            },
        ):
            old = settings_mod.settings.object_store_root
            settings_mod.settings.object_store_root = "s3://"
            try:
                store = get_default_store()
            finally:
                settings_mod.settings.object_store_root = old
        self.assertIsInstance(store, S3ObjectStore)
        self.assertEqual(store.endpoint, "http://127.0.0.1:1")
        self.assertEqual(store.region, "eu-west-2")
        self.assertEqual(store.credentials.access_key, "AK")


if __name__ == "__main__":
    unittest.main()
