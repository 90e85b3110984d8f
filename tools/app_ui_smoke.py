"""Drive the stdlib web UI end-to-end over HTTP (the same requests the
page's JS issues): load the page, list galleries, POST generate, poll
status until the MP4 lands, fetch the MP4 bytes.

Usage: python tools/app_ui_smoke.py [--port 7861] [--timeout 900]
(start `python app.py ...` first; see .claude/skills/verify/SKILL.md)
"""
import argparse
import json
import sys
import time
import urllib.request


def get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=7861)
    ap.add_argument("--timeout", type=float, default=1800)
    a = ap.parse_args()
    base = f"http://127.0.0.1:{a.port}"

    page = get(base + "/").decode()
    assert "GUAVA-TPU" in page and "Generate" in page, "UI page malformed"
    items = json.loads(get(base + "/api/items"))
    print("[ui] galleries:", items)
    src = items["sources"][0]["name"]
    vid = items["videos"][0]["name"]

    req = urllib.request.Request(
        f"{base}/api/generate?src={src}&vid={vid}", method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        print("[ui] generate ->", r.read().decode())

    t0 = time.time()
    while True:
        st = json.loads(get(f"{base}/api/status?src={src}&vid={vid}"))
        print(f"[ui] {time.time()-t0:5.0f}s status: {st['status']}")
        if st.get("result"):
            blob = get(f"{base}/media/{st['result']}")
            print(f"[ui] fetched result {st['result']}: {len(blob)} bytes")
            assert len(blob) > 1000, "result MP4 suspiciously small"
            print("[ui] PASS")
            return
        if "failed" in st["status"]:
            print("[ui] FAIL"); sys.exit(1)
        if time.time() - t0 > a.timeout:
            print("[ui] TIMEOUT"); sys.exit(1)
        time.sleep(10)


if __name__ == "__main__":
    main()
