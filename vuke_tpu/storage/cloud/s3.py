"""Minimal S3-compatible client: AWS SigV4 PUT/GET/LIST over requests.

Replaces the reference's object_store AmazonS3Builder::from_env
(/root/reference/src/storage/cloud/s3.rs) without third-party SDKs.
Credentials resolve CLOUD_* then AWS_* env vars
(cloud/credentials.rs semantics).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import os
import urllib.parse
from typing import List, Optional

from . import CloudConfig, CloudPath


def _env(*names, default=None):
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return default


class S3Uploader:
    def __init__(self, config: CloudConfig):
        self.config = config
        self.bucket = config.bucket
        self.endpoint = config.endpoint
        self.access_key = _env("CLOUD_ACCESS_KEY_ID", "AWS_ACCESS_KEY_ID")
        self.secret_key = _env("CLOUD_SECRET_ACCESS_KEY", "AWS_SECRET_ACCESS_KEY")
        self.region = _env("CLOUD_REGION", "AWS_REGION", default="us-east-1")
        if not self.access_key or not self.secret_key:
            raise RuntimeError(
                "missing credentials: set CLOUD_ACCESS_KEY_ID/CLOUD_SECRET_ACCESS_KEY "
                "or AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY")

    # -- SigV4 --------------------------------------------------------------

    def _sign(self, method: str, url: str, payload_hash: str, headers: dict) -> dict:
        parsed = urllib.parse.urlparse(url)
        now = _dt.datetime.now(_dt.timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        datestamp = now.strftime("%Y%m%d")
        headers = dict(headers)
        headers["host"] = parsed.netloc
        headers["x-amz-date"] = amz_date
        headers["x-amz-content-sha256"] = payload_hash

        signed_names = sorted(headers)
        canonical_headers = "".join(f"{k}:{headers[k].strip()}\n" for k in signed_names)
        signed_headers = ";".join(signed_names)
        canonical_request = "\n".join([
            method, urllib.parse.quote(parsed.path, safe="/-_.~"),
            parsed.query, canonical_headers, signed_headers, payload_hash])
        scope = f"{datestamp}/{self.region}/s3/aws4_request"
        string_to_sign = "\n".join([
            "AWS4-HMAC-SHA256", amz_date, scope,
            hashlib.sha256(canonical_request.encode()).hexdigest()])

        def _hmac(key, msg):
            return hmac.new(key, msg.encode(), hashlib.sha256).digest()

        k = _hmac(("AWS4" + self.secret_key).encode(), datestamp)
        k = _hmac(k, self.region)
        k = _hmac(k, "s3")
        k = _hmac(k, "aws4_request")
        signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
        headers["Authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}")
        return headers

    def _url(self, key: str) -> str:
        if self.endpoint:
            return f"{self.endpoint.rstrip('/')}/{self.bucket}/{urllib.parse.quote(key)}"
        return (f"https://{self.bucket}.s3.{self.region}.amazonaws.com/"
                f"{urllib.parse.quote(key)}")

    # -- operations ---------------------------------------------------------

    def upload_file(self, local_path: str, key: str) -> CloudPath:
        import requests
        with open(local_path, "rb") as f:
            data = f.read()
        payload_hash = hashlib.sha256(data).hexdigest()
        url = self._url(key)
        headers = self._sign("PUT", url, payload_hash,
                             {"content-length": str(len(data))})
        resp = requests.put(url, data=data, headers=headers, timeout=60)
        if resp.status_code not in (200, 201):
            raise RuntimeError(f"S3 PUT {key} failed: {resp.status_code} {resp.text[:200]}")
        return CloudPath(self.bucket, key)

    def list_objects(self, prefix: Optional[str] = None) -> List[CloudPath]:
        import requests
        q = {"list-type": "2"}
        if prefix:
            q["prefix"] = prefix
        base = (self.endpoint.rstrip("/") + "/" + self.bucket if self.endpoint
                else f"https://{self.bucket}.s3.{self.region}.amazonaws.com")
        url = base + "/?" + urllib.parse.urlencode(sorted(q.items()))
        payload_hash = hashlib.sha256(b"").hexdigest()
        headers = self._sign("GET", url, payload_hash, {})
        resp = requests.get(url, headers=headers, timeout=60)
        if resp.status_code != 200:
            raise RuntimeError(f"S3 LIST failed: {resp.status_code}")
        import re
        keys = re.findall(r"<Key>([^<]+)</Key>", resp.text)
        return [CloudPath(self.bucket, k) for k in keys]


class InMemoryUploader:
    """Test fake (the object_store::memory::InMemory analogue, with optional
    failure injection like the reference's TestUploader, sync.rs:169-215)."""

    def __init__(self, bucket: str = "test-bucket", fail_keys=(), fail_times: int = 0):
        self.bucket = bucket
        self.objects = {}
        self.fail_keys = set(fail_keys)
        self.fail_times = fail_times
        self._failures = {}

    def upload_file(self, local_path: str, key: str) -> CloudPath:
        if key in self.fail_keys:
            n = self._failures.get(key, 0)
            if self.fail_times < 0 or n < self.fail_times:
                self._failures[key] = n + 1
                raise RuntimeError(f"injected failure for {key}")
        with open(local_path, "rb") as f:
            self.objects[key] = f.read()
        return CloudPath(self.bucket, key)

    def list_objects(self, prefix: Optional[str] = None) -> List[CloudPath]:
        keys = sorted(k for k in self.objects if not prefix or k.startswith(prefix))
        return [CloudPath(self.bucket, k) for k in keys]
