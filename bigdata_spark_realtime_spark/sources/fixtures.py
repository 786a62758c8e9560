"""Deterministic Group-2 fixtures (FIXTURES.md §2.1-2.5).

The driver supplies only the Group-1 star schema; the four reference
pipelines additionally need their own input shapes (nested log JSON, CDC
envelopes, order streams, dims). This module generates them — seeded,
pure-python — as multi-file datasets so a file-based ``readStream`` with
``maxFilesPerTrigger=1`` replays them as real micro-batches.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone

BASE_TS = int(datetime(2024, 3, 1, 22, 0, 0, tzinfo=timezone.utc).timestamp() * 1000)
PAGES = ["home", "good_detail", "cart", "order", "mine", "search"]
ITEMS = ["iphone 13", "xiaomi mix", "thinkpad x1", "airpods", "kindle"]
SKU_NAMES = [
    "Apple iPhone 13", "Apple iPhone 13 Pro", "Xiaomi Mix Fold", "小米手机 Pro",
    "ThinkPad X1 Carbon", "Apple AirPods Pro", "Kindle Paperwhite",
]
CHANNELS = ["Appstore", "xiaomi", "huawei", "web"]


def _fmt_dt(ms: int) -> str:
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _write_files(path: str, rows: list[str], n_files: int, ext: str = "jsonl") -> None:
    os.makedirs(path, exist_ok=True)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        with open(os.path.join(path, f"part-{i:04d}.{ext}"), "w") as f:
            f.write("\n".join(chunk))


def gen_raw_log(path: str, n_rows: int = 2000, n_files: int = 4, seed: int = 42) -> None:
    """Nested event-log JSON exercising every base_log branch: ~5% err,
    ~80% page (30% entry pages), ~20% start; displays 0-6, actions 0-4;
    mid pool 1/50 of rows and ts spread over 2 days (per-day dups +
    rollover for the DAU dedup)."""
    rng = random.Random(seed)
    mids = [f"mid_{i}" for i in range(max(2, n_rows // 50))]
    recs: list[dict] = []
    for i in range(n_rows):
        ts = BASE_TS + int(rng.random() * 2 * 86400_000)  # 2 calendar days
        common = {
            "ar": str(rng.randint(1, 34)),
            "uid": str(rng.randint(1, 50)),
            "os": rng.choice(["Android 12", "iOS 16"]),
            "ch": rng.choice(CHANNELS),
            "is_new": rng.choice(["0", "1"]),
            "md": rng.choice(["model-a", "model-b"]),
            "mid": rng.choice(mids),
            "vc": "v2.1.134",
            "ba": rng.choice(["Xiaomi", "Apple", "Huawei"]),
        }
        rec: dict = {"common": common, "ts": ts}
        if rng.random() < 0.05:
            rec["err"] = {"error_code": rng.randint(1000, 4000), "msg": "boom"}
        if rng.random() < 0.8:
            page = {
                "page_id": rng.choice(PAGES),
                "item": rng.choice(ITEMS),
                "item_type": "sku_id",
                "during_time": rng.randint(1000, 18000),
                "source_type": rng.choice(["promotion", "query", "recommend"]),
            }
            if rng.random() >= 0.3:  # ~30% entry pages (ABSENT key)
                page["last_page_id"] = rng.choice(PAGES)
            rec["page"] = page
            rec["displays"] = [
                {
                    "display_type": rng.choice(["promotion", "query"]),
                    "item": rng.choice(ITEMS),
                    "item_type": "sku_id",
                    "order": str(d),
                    "pos_id": str(rng.randint(1, 5)),
                }
                for d in range(rng.randint(0, 6))
            ]
            rec["actions"] = [
                {
                    "action_id": rng.choice(["cart_add", "favor_add"]),
                    "item": rng.choice(ITEMS),
                    "item_type": "sku_id",
                    "ts": ts + a * 1000,
                }
                for a in range(rng.randint(0, 4))
            ]
        else:
            rec["start"] = {
                "entry": rng.choice(["icon", "notice", "install"]),
                "loading_time": rng.randint(1000, 15000),
                "open_ad_id": str(rng.randint(1, 20)),
                "open_ad_ms": rng.randint(1000, 8000),
                "open_ad_skip_ms": rng.randint(0, 4000),
            }
        recs.append(rec)
    # arrival ≈ event order (like a real log feed) so streaming replay has
    # a monotonic watermark; disorder within a file is fine
    recs.sort(key=lambda r: r["ts"])
    _write_files(path, [json.dumps(r, ensure_ascii=False) for r in recs], n_files)


def gen_cdc(path: str, n_rows: int = 1000, n_files: int = 4, seed: int = 43) -> None:
    """Maxwell-style CDC envelopes: all op types incl bootstrap-insert and
    ~2% garbage ops; fact tables, dim tables, and one unlisted table."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        r = rng.random()
        if r < 0.02:
            op = "garbage-op"
        elif r < 0.12:
            op = "bootstrap-insert"
        elif r < 0.72:
            op = "insert"
        elif r < 0.9:
            op = "update"
        else:
            op = "delete"
        table = rng.choice(
            ["order_info", "order_detail", "user_info", "base_province", "unlisted_tbl"]
        )
        data = {"id": i, "payload": f"{table}-{i}"}
        rows.append(json.dumps({"type": op, "table": table, "data": data}))
    _write_files(path, rows, n_files)


def gen_dims(path: str, n_users: int = 60, seed: int = 44) -> None:
    """user_info + base_province dim tables (JSONL; FIXTURES.md §2.5)."""
    rng = random.Random(seed)
    users = [
        json.dumps(
            {
                "id": i,
                "gender": rng.choice(["F", "M"]),
                # ages spanning <20 / 20-29 / >=30 against 2024 refs
                "birthday": f"{rng.randint(1960, 2010)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
            }
        )
        for i in range(1, n_users + 1)
    ]
    provinces = [
        json.dumps(
            {
                "id": i,
                "name": f"province_{i}",
                "iso_code": f"CN-{10 + i}",
                "iso_3166_2": f"CN-{10 + i}",
                "area_code": str(100 + i),
            }
        )
        for i in range(1, 35)
    ]
    _write_files(os.path.join(path, "user_info"), users, 1)
    _write_files(os.path.join(path, "base_province"), provinces, 1)


def gen_order_streams(
    path: str, n_orders: int = 300, n_files: int = 5, seed: int = 45
) -> dict:
    """order_info + order_detail streams (FIXTURES.md §2.3/2.4) with
    arrival skew: ~10% of details arrive before their order_info, ~10%
    arrive much later, and ~1% beyond the 24 h join TTL (planted ids
    returned for assertions). event_ts drives watermarks; files are
    ordered by event_ts so replay is realistic."""
    rng = random.Random(seed)
    infos, details = [], []
    ttl_dropped: list[int] = []
    detail_id = 0
    for oid in range(1, n_orders + 1):
        create_ms = BASE_TS + int(rng.random() * 6 * 3600_000)  # 6 h window
        info_arrival = create_ms + rng.randint(0, 60_000)
        infos.append(
            {
                "id": oid,
                "province_id": rng.randint(1, 34),
                "order_status": rng.choice(["1001", "1002", "1003", "1004", "1005"]),
                "user_id": rng.randint(1, 60),
                "total_amount": round(rng.uniform(20, 2000), 2),
                "activity_reduce_amount": round(rng.uniform(0, 50), 2),
                "coupon_reduce_amount": round(rng.uniform(0, 30), 2),
                "original_total_amount": round(rng.uniform(20, 2100), 2),
                "feight_fee": round(rng.uniform(0, 20), 2),
                "feight_fee_reduce": 0.0,
                "expire_time": _fmt_dt(create_ms + 1800_000),
                "refundable_time": _fmt_dt(create_ms + 7 * 86400_000),
                "operate_time": _fmt_dt(create_ms),
                "create_time": _fmt_dt(create_ms),
                "event_ts": info_arrival,
            }
        )
        for _ in range(rng.randint(1, 4)):
            detail_id += 1
            r = rng.random()
            if r < 0.1:  # early: before the info
                arrival = info_arrival - rng.randint(60_000, 600_000)
            elif r < 0.2:  # late: a few hours after
                arrival = info_arrival + rng.randint(3600_000, 5 * 3600_000)
            elif r < 0.21:  # beyond the 24 h TTL → must be dropped
                arrival = info_arrival + 25 * 3600_000 + rng.randint(0, 3600_000)
                ttl_dropped.append(detail_id)
            else:
                arrival = info_arrival + rng.randint(0, 120_000)
            price = round(rng.uniform(10, 900), 2)
            num = rng.randint(1, 5)
            details.append(
                {
                    "id": detail_id,
                    "order_id": oid,
                    "sku_id": rng.randint(1, 200),
                    "order_price": price,
                    "sku_num": num,
                    "sku_name": rng.choice(SKU_NAMES),
                    "create_time": _fmt_dt(create_ms),
                    "split_total_amount": round(price * num, 2),
                    "split_activity_amount": round(rng.uniform(0, 20), 2),
                    "split_coupon_amount": round(rng.uniform(0, 10), 2),
                    "event_ts": arrival,
                }
            )
    infos.sort(key=lambda r: r["event_ts"])
    details.sort(key=lambda r: r["event_ts"])
    _write_files(
        os.path.join(path, "order_info"), [json.dumps(r) for r in infos], n_files
    )
    _write_files(
        os.path.join(path, "order_detail"), [json.dumps(r) for r in details], n_files
    )
    return {"ttl_dropped_detail_ids": ttl_dropped, "n_details": detail_id}


def gen_media(
    path: str,
    n_images: int = 30,
    n_audio: int = 30,
    seed: int = 46,
    n_neardup: int = 8,
) -> None:
    """Deterministic multimodal fixtures: real PNG and WAV payloads in a
    parquet `media` table (media_id, kind, payload binary) plus a
    `media_truth.jsonl` ground truth computed from the PRE-encode raw
    arrays. The Spark-side decoder (operators/media_codec.py) must
    round-trip the encoded bytes back to those exact pixels/samples —
    the oracle reads this file, so a decoder bug is a hash mismatch,
    not a silently-wrong stub."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_spark_realtime_spark.operators.media_codec import (
        png_encode,
        wav_encode,
    )
    from bigdata_spark_realtime_spark.operators.multimodal import (
        FEATURE_DIM,
        GATE_RESIZE,
        hash_thumb,
        int_feature_projection,
        audiohash64,
        phash64,
        proj_hash,
        resample_nn,
    )

    rng = random.Random(seed)
    os.makedirs(path, exist_ok=True)
    ids, kinds, payloads, truth = [], [], [], []

    def add_image(mid: int, pixels: bytes, width: int, height: int, channels: int):
        ids.append(mid)
        kinds.append("image")
        payloads.append(png_encode(pixels, width, height, channels))
        truth.append(
            {
                "media_id": mid,
                "kind": "image",
                "width": width,
                "height": height,
                "n_channels": channels,
                "sample_rate": 0,
                "n_frames": 0,
                "content_md5": hashlib.md5(pixels).hexdigest(),
                "feat_dim": FEATURE_DIM,
                "proj_hash": proj_hash(int_feature_projection(pixels)),
                # ground truth for the oracle-gated resize round trip:
                # the same nearest-neighbor index grid over the
                # PRE-encode pixels (PNG is lossless, so decode ->
                # resample -> re-encode -> decode reproduces it exactly)
                "resized_md5": hashlib.md5(
                    resample_nn(
                        pixels, width, height, channels, GATE_RESIZE, GATE_RESIZE
                    )
                ).hexdigest(),
                # perceptual fingerprint of the PRE-encode pixels —
                # ground truth for the pHash near-dup pair query
                "phash": phash64(pixels, width, height, channels),
                "ahash": None,
            }
        )
        return pixels, width, height, channels

    originals = []
    for i in range(n_images):
        width = rng.randint(8, 48)
        height = rng.randint(8, 40)
        channels = rng.choice([1, 3, 3, 4])  # grey / RGB (common) / RGBA
        pixels = bytes(rng.randrange(256) for _ in range(width * height * channels))
        originals.append(add_image(i, pixels, width, height, channels))

    def add_audio(mid: int, frames: bytes, n_channels: int, frame_rate: int, n_frames: int):
        ids.append(mid)
        kinds.append("audio")
        payloads.append(wav_encode(frames, n_channels, 2, frame_rate))
        truth.append(
            {
                "media_id": mid,
                "kind": "audio",
                "width": 0,
                "height": 0,
                "n_channels": n_channels,
                "sample_rate": frame_rate,
                "n_frames": n_frames,
                "content_md5": hashlib.md5(frames).hexdigest(),
                "feat_dim": FEATURE_DIM,
                "proj_hash": proj_hash(int_feature_projection(frames)),
                # audio takes the deterministic hash-thumbnail path,
                # keyed on the ENCODED payload bytes
                "resized_md5": hashlib.md5(
                    hash_thumb(payloads[-1], GATE_RESIZE * GATE_RESIZE)
                ).hexdigest(),
                "phash": None,
                # energy-signature ground truth for the audio near-dup
                # pair query (PCM sibling of the image phash)
                "ahash": audiohash64(frames),
            }
        )
        return frames, n_channels, frame_rate, n_frames

    audio_originals = []
    for j in range(n_audio):
        mid = n_images + j
        n_channels = rng.choice([1, 2])
        frame_rate = rng.choice([8000, 16000, 44100])
        n_frames = rng.randint(200, 2000)
        frames = bytes(
            rng.randrange(256) for _ in range(n_frames * n_channels * 2)
        )
        audio_originals.append(
            add_audio(mid, frames, n_channels, frame_rate, n_frames)
        )

    # near-duplicate image copies — the organic positives the pHash
    # pair query and its oracle both must find. Half get a whisper
    # perturbation (+1 on two bytes: block means barely move, hamming
    # stays 0), half a stronger one (+3 on every 16th byte: enough to
    # flip the handful of bits sitting near the mean threshold,
    # exercising the 1..3-bit tolerance and the pigeonhole bands).
    for k in range(min(n_neardup, n_images)):
        pixels, width, height, channels = originals[k]
        buf = bytearray(pixels)
        if k % 2 == 0:
            for pos in (len(buf) // 3, (2 * len(buf)) // 3):
                buf[pos] = min(255, buf[pos] + 1)
        else:
            for pos in range(0, len(buf), 16):
                buf[pos] = min(255, buf[pos] + 3)
        add_image(n_images + n_audio + k, bytes(buf), width, height, channels)

    # near-duplicate audio copies: +1 (clamped) on the low byte of one
    # int16 sample per 128 raw bytes (mono: every 64th sample; stereo:
    # one channel-slot per 32 frames) — a sub-LSB-of-energy amplitude
    # nudge either way, so each copy's 64-block energy signature lands
    # within a few hamming bits of its original (the audio analog of
    # the image perturbations above).
    for k in range(min(n_neardup, n_audio)):
        frames, n_channels, frame_rate, n_frames = audio_originals[k]
        buf = bytearray(frames)
        for pos in range(0, len(buf), 128):  # LE int16 -> even = low byte
            buf[pos] = min(255, buf[pos] + 1)
        add_audio(
            n_images + n_audio + n_neardup + k,
            bytes(buf), n_channels, frame_rate, n_frames,
        )

    table = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    pq.write_table(table, os.path.join(path, "media.parquet"))
    with open(os.path.join(path, "media_truth.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in truth))

    # --- video fixtures (separate table: the PNG/WAV-only queries
    # above keep their payload universe; video gets its own) ---------
    from bigdata_spark_realtime_spark.operators.media_codec import (
        mjv_encode,
    )

    from bigdata_spark_realtime_spark.operators.multimodal import (
        frame_luma_sum,
    )

    vids, vpayloads, vtruth = [], [], []
    for v in range(6):
        mid = 1000 + v
        width = rng.randint(8, 24)
        height = rng.randint(8, 20)
        channels = rng.choice([1, 3])
        # scene structure: 1-3 scenes alternating dark/bright pixel
        # ranges (mean luma ~90 vs ~165, a >>threshold jump at each
        # boundary; in-scene frame-to-frame mean jitter is ~3 luma) —
        # the planted positives for scene-cut detection
        n_scenes = rng.randint(1, 3)
        frames, fi = [], 0
        for sc in range(n_scenes):
            lo, hi = (0, 181) if (v + sc) % 2 == 0 else (75, 256)
            for _ in range(rng.randint(2, 4)):
                pixels = bytes(
                    rng.randrange(lo, hi)
                    for _ in range(width * height * channels)
                )
                frames.append(png_encode(pixels, width, height, channels))
                vtruth.append(
                    {
                        "media_id": mid,
                        "frame_idx": fi,
                        "width": width,
                        "height": height,
                        "frame_md5": hashlib.md5(pixels).hexdigest(),
                        # exact integer luma total — scene-cut ground truth
                        "luma_sum": frame_luma_sum(
                            pixels, width, height, channels
                        ),
                        "n_pix": width * height,
                    }
                )
                fi += 1
        vids.append(mid)
        vpayloads.append(mjv_encode(frames))
    vtable = pa.table(
        {
            "media_id": pa.array(vids, pa.int64()),
            "kind": pa.array(["video"] * len(vids), pa.string()),
            "payload": pa.array(vpayloads, pa.binary()),
        }
    )
    pq.write_table(vtable, os.path.join(path, "media_video.parquet"))
    with open(os.path.join(path, "video_truth.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in vtruth))
