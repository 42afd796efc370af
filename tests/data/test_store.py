"""Object-store tests: atomic/idempotent writes, listing as progress truth,
parallel downloads with failure collection (reference analog: fake-S3 tests,
tests/pyspacer/test_build_feature_bucket.py:169-360)."""

import pytest

from mermaid_classifier_tpu.data.store import (
    LocalFSObjectStore,
    ObjectStoreError,
    download_parallel,
)


@pytest.fixture()
def store(tmp_path):
    return LocalFSObjectStore(tmp_path / "store")


class TestLocalFSObjectStore:
    def test_put_get_exists(self, store):
        store.put_bytes("bucket", "a/b/c.bin", b"data")
        assert store.exists("bucket", "a/b/c.bin")
        assert not store.exists("bucket", "a/b/missing.bin")
        assert store.get_bytes("bucket", "a/b/c.bin") == b"data"

    def test_get_missing_raises(self, store):
        with pytest.raises(ObjectStoreError, match="not found"):
            store.get_bytes("bucket", "nope")

    def test_overwrite_idempotent(self, store):
        store.put_bytes("b", "k", b"v1")
        store.put_bytes("b", "k", b"v2")
        assert store.get_bytes("b", "k") == b"v2"

    def test_list_keys_prefix_and_no_part_files(self, store, tmp_path):
        store.put_bytes("b", "s1/i1.npz", b"x")
        store.put_bytes("b", "s1/i2.npz", b"x")
        store.put_bytes("b", "s2/i3.npz", b"x")
        # a stray .part file must never appear in listings
        (store.root / "b" / "s1" / "stray.part").write_bytes(b"junk")
        assert sorted(store.list_keys("b")) == ["s1/i1.npz", "s1/i2.npz", "s2/i3.npz"]
        assert sorted(store.list_keys("b", prefix="s1/")) == ["s1/i1.npz", "s1/i2.npz"]
        assert list(store.list_keys("empty_bucket")) == []

    def test_key_escape_rejected(self, store):
        with pytest.raises(ObjectStoreError, match="escapes"):
            store.put_bytes("b", "../../etc/passwd", b"x")

    def test_download_atomic(self, store, tmp_path):
        store.put_bytes("b", "k", b"payload")
        local = tmp_path / "dl" / "k.bin"
        store.download("b", "k", local)
        assert local.read_bytes() == b"payload"
        assert list(local.parent.glob("*.part")) == []

    def test_delete(self, store):
        store.put_bytes("b", "k", b"x")
        store.delete("b", "k")
        assert not store.exists("b", "k")
        store.delete("b", "k")  # idempotent

    def test_download_hardlinks_on_same_fs(self, store, tmp_path):
        """The local-store download must not rewrite bytes disk-to-disk
        (150 s of a C2-scale drive before this): same filesystem gets a
        hardlink, byte-identical and .part-free."""
        import os

        store.put_bytes("b", "k", b"feature-bytes")
        local = tmp_path / "cache" / "k.npz"
        store.download("b", "k", local)
        assert local.read_bytes() == b"feature-bytes"
        src = store._path("b", "k")
        assert os.stat(local).st_ino == os.stat(src).st_ino
        assert list(local.parent.glob("*.part")) == []
        # The link aliases the store inode: write bits are dropped so an
        # in-place write through the cache path fails loudly (EACCES for
        # any non-root consumer; root bypasses permission bits, so the
        # assertion is on the mode itself).
        import stat

        mode = stat.S_IMODE(os.stat(local).st_mode)
        assert mode & (stat.S_IWUSR | stat.S_IWGRP | stat.S_IWOTH) == 0

    def test_downloaded_copy_survives_store_overwrite(self, store, tmp_path):
        """put_bytes replaces the STORE inode (temp + os.replace), so a
        previously downloaded cache file must keep the bytes it
        downloaded — the cache stays a consistent snapshot."""
        store.put_bytes("b", "k", b"v1")
        local = tmp_path / "cache" / "k.bin"
        store.download("b", "k", local)
        store.put_bytes("b", "k", b"v2-new")
        assert store.get_bytes("b", "k") == b"v2-new"
        assert local.read_bytes() == b"v1"

    def test_download_missing_raises(self, store, tmp_path):
        with pytest.raises(ObjectStoreError, match="not found"):
            store.download("b", "nope", tmp_path / "x")

    def test_download_falls_back_to_copy_across_devices(
        self, store, tmp_path, monkeypatch
    ):
        """A cache dir on a different filesystem cannot hardlink (EXDEV);
        the download must degrade to the base byte copy, leaving no
        .part files."""
        import os

        store.put_bytes("b", "k", b"cross-device-bytes")

        def no_link(src, dst):
            raise OSError(18, "Invalid cross-device link")  # EXDEV

        monkeypatch.setattr(os, "link", no_link)
        local = tmp_path / "othermount" / "k.bin"
        store.download("b", "k", local)
        assert local.read_bytes() == b"cross-device-bytes"
        assert list(local.parent.glob("*.part")) == []
        # The copy is a distinct inode (no aliasing without the link).
        assert os.stat(local).st_ino != os.stat(store._path("b", "k")).st_ino


class TestDownloadParallel:
    def test_downloads_and_collects_failures(self, store, tmp_path):
        store.put_bytes("b", "ok1", b"1")
        store.put_bytes("b", "ok2", b"2")
        jobs = {
            ("b", "ok1"): str(tmp_path / "out/ok1"),
            ("b", "ok2"): str(tmp_path / "out/ok2"),
            ("b", "missing"): str(tmp_path / "out/missing"),
        }
        failed = download_parallel(store, jobs, max_workers=4)
        assert failed == {("b", "missing")}
        assert (tmp_path / "out/ok1").read_bytes() == b"1"
        assert not (tmp_path / "out/missing").exists()

    def test_skip_existing(self, store, tmp_path):
        local = tmp_path / "out/k"
        local.parent.mkdir(parents=True)
        local.write_bytes(b"already here")
        store.put_bytes("b", "k", b"fresh")
        failed = download_parallel(store, {("b", "k"): str(local)}, skip_existing=True)
        assert not failed
        assert local.read_bytes() == b"already here"
        download_parallel(store, {("b", "k"): str(local)}, skip_existing=False)
        assert local.read_bytes() == b"fresh"
