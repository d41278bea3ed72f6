"""local_path — the one URI→filesystem-path translation every
path-pruned reader (read_warc_paths, read_webdataset, hash_folder)
shares. Getting an authority wrong opens the WRONG FILE on NFS/FUSE
deployments, so the contract is pinned here."""

import pytest

from oil_wells_data_wrangling_spark.sources.pathutil import local_path


def test_local_path_plain_and_uri_forms():
    assert local_path("/a/b.tar") == "/a/b.tar"
    assert local_path("file:/a/b.tar") == "/a/b.tar"
    assert local_path("file:///a/b.tar") == "/a/b.tar"
    assert local_path("file://localhost/a/b.tar") == "/a/b.tar"


def test_local_path_rejects_remote_authority():
    """'file://host/x' must NOT silently become '/host/x' (the
    pre-r12 lstrip bug): that path may exist and be the wrong file."""
    with pytest.raises(ValueError, match="non-local authority"):
        local_path("file://nfs-head/exports/x.tar")


def test_local_path_keeps_url_special_chars():
    """'#' and '?' are legal in filenames; a URL parser would truncate
    at them. The hand parse must keep them."""
    assert local_path("file:/a/b#frag.tar") == "/a/b#frag.tar"
    assert local_path("file:///a/b?q=1.tar") == "/a/b?q=1.tar"
