"""Journal compaction (VERDICT r2 item 9): long games must not grow their
journals unboundedly, and restore cost must be O(SNAP_EVERY), not O(room
lifetime). The host periodically rewrites the journal as header + one full
state snapshot (engine banks, chat, notes, projection state, queues);
replay resumes from the snapshot and re-runs only the tail."""

import os
import time

import pytest

from game_engine_tpu.server.api import AppContext


def _journal_file(storage_path, rid):
    return os.path.join(storage_path + ".rooms", f"{rid}.jsonl")



def _write_marathon(tmp_path):
    """A gift-circle variant whose round cap keeps it alive for thousands
    of steps (the win thresholds are unreachable in test horizons)."""
    import yaml

    from game_engine_tpu.gamespec.parser import games_dir

    gdir = tmp_path / "games"
    gdir.mkdir(exist_ok=True)
    import shutil

    for fn in ("gift-circle.yaml",):
        shutil.copy(os.path.join(games_dir(), fn), gdir / fn)
    doc = yaml.safe_load(open(os.path.join(games_dir(), "gift-circle.yaml")))
    nxt = {}
    for cond, tgt in doc["phases"][2]["next_phase"].items():
        if "coins" in cond:
            nxt["If any player has 1000000 or more coins"] = tgt
        elif "rounds" in cond:
            nxt["If any player has 6000 or more rounds"] = tgt
        else:
            nxt[cond] = tgt
    doc["phases"][2]["next_phase"] = nxt
    with open(gdir / "marathon.yaml", "w") as f:
        yaml.safe_dump(doc, f, sort_keys=False)
    return str(gdir)


def _make_room(ctx, game="gift-circle", seed=21):
    _, d = ctx.handle("POST", "/api/rooms/create", {},
                      {"gameName": game, "playerName": "Z"})
    rid = d["room"]["roomId"]
    ctx.handle("POST", "/api/rooms/add-bot", {}, {"roomId": rid})
    ctx.handle("POST", f"/api/rooms/{rid}/start", {}, {"seed": seed})
    return rid


def test_compaction_bounds_journal_and_restores_identically(tmp_path):
    """Drive a room far past SNAP_EVERY steps: the journal stays bounded,
    and a kill-restart restores the room bit-identically from the snapshot
    plus the short tail (chat, notes, items and queue included)."""
    gdir = _write_marathon(tmp_path)
    sp = str(tmp_path / "rooms.json")
    ctx = AppContext(sp, games_path=gdir, backend="native")
    ctx.host.SNAP_EVERY = 10  # compact often so the test stays fast
    rid = _make_room(ctx, game="marathon")
    steps = 0
    # werewolf-free loop: step the room manually; humans vote when waited on
    for _ in range(130):
        snap = ctx.host.snapshot(rid)
        if snap["done"]:
            break
        for pid in snap["waiting_on"]:
            ctx.handle("POST", f"/api/rooms/{rid}/vote", {},
                       {"playerId": pid, "option": 1})
        ctx.handle("POST", f"/api/rooms/{rid}/step", {}, {})
        steps += 1
        if steps == 15:  # mid-game chat ends up inside the snapshot
            ctx.handle("POST", f"/api/rooms/{rid}/chat", {},
                       {"playerId": 1, "message": "to Bot 2: status?"})
    assert steps > 25, "room ended before compaction was exercised"
    # the journal was compacted: far fewer lines than events generated
    with open(_journal_file(sp, rid), encoding="utf-8") as f:
        n_lines = sum(1 for _ in f)
    assert n_lines <= 2 * ctx.host.SNAP_EVERY + 5, n_lines

    ref = ctx.host.snapshot(rid)
    _, ref_chat = ctx.handle("GET", f"/api/rooms/{rid}/chat",
                             {"playerId": ["1"]}, {})
    _, ref_notes = ctx.handle("GET", f"/api/rooms/{rid}/notes", {}, {})
    ref_queue = dict(ctx.host._queues.get(rid, {}))
    del ctx  # kill -9

    ctx2 = AppContext(sp, games_path=gdir, backend="native")
    snap2 = ctx2.host.snapshot(rid)
    assert snap2["stateVersion"] == ref["stateVersion"]
    assert snap2["current_phase_id"] == ref["current_phase_id"]
    assert snap2["player_states"] == ref["player_states"]
    # item IDs legitimately vary with read patterns (the reference derives
    # ids from max(existing, counter)+1 per re-render, page.tsx:855-862);
    # compare the rendered content instead
    strip = lambda items: [
        {k: v for k, v in it.items() if k != "id"} for it in items]
    assert strip(snap2["items"]) == strip(ref["items"])
    assert snap2["phase_history"] == ref["phase_history"]
    assert ctx2.host._queues.get(rid, {}) == ref_queue
    _, chat2 = ctx2.handle("GET", f"/api/rooms/{rid}/chat",
                           {"playerId": ["1"]}, {})
    assert chat2["messages"] == ref_chat["messages"]
    _, notes2 = ctx2.handle("GET", f"/api/rooms/{rid}/notes", {}, {})
    assert notes2 == ref_notes
    # and the room keeps playing after restore
    _, snap3 = ctx2.handle("POST", f"/api/rooms/{rid}/continue", {}, {})
    assert snap3["stateVersion"] > ref["stateVersion"] or snap3["done"]


def test_ten_k_restore_under_one_second(tmp_path):
    """Tight version: build the long room, then time restore_room alone."""
    from game_engine_tpu.server.manager import GameHost

    gdir = _write_marathon(tmp_path)

    pdir = str(tmp_path / "journals")
    host = GameHost(games_path=gdir, backend="native", persist_dir=pdir)
    host.start_room("long", "marathon", 4, seed=3, human_seats=[4])
    steps = 0
    while steps < 10_000:
        snap = host.run_until_input_needed("long", max_steps=512)
        steps = snap["stateVersion"]
        if snap["done"]:
            break
        for pid in snap["waiting_on"]:
            host.queue_action("long", pid, 1)
    assert steps >= 10_000, f"room ended early at {steps} steps"
    ref = host.snapshot("long")

    host2 = GameHost(games_path=gdir, backend="native", persist_dir=pdir)
    host2._game_slots("marathon")  # compile once (per-server, not per-room)
    t0 = time.time()
    assert host2.restore_room("long")
    restore_wall = time.time() - t0
    assert restore_wall < 1.0, f"10k-step restore took {restore_wall:.2f}s"
    snap2 = host2.snapshot("long")
    assert snap2["stateVersion"] == ref["stateVersion"]
    assert snap2["player_states"] == ref["player_states"]


def test_chat_during_compaction_window_not_duplicated(tmp_path):
    """ADVICE r3 (medium): post_chat releases the host lock while the bot
    reply decodes (the --chat-lm window); a concurrent step() compacting
    the journal in that window snapshots chat.messages WITH the trigger —
    the trigger must therefore be journaled in the same lock hold as
    chat.post (and the reply as a separate chat_reply event), or replay
    posts the message twice. Simulated deterministically: an lm_hook that
    compacts mid-decode, then a kill-restart."""
    from game_engine_tpu.server.api import AppContext

    sp = str(tmp_path / "rooms.json")
    ctx = AppContext(sp, backend="native")
    rid = _make_room(ctx)
    host = ctx.host
    chat = host._chats[rid]
    compacted = []

    def hook(context):
        host._compact_journal(rid)  # the concurrent step()'s SNAP_EVERY hit
        compacted.append(True)
        return None  # fall back to the template reply

    chat.lm_hook = hook
    ctx.handle("POST", f"/api/rooms/{rid}/chat", {},
               {"playerId": 1, "message": "to Bot 2: hello there friend"})
    assert compacted, "lm_hook (and thus the mid-window compaction) never ran"
    _, ref_chat = ctx.handle("GET", f"/api/rooms/{rid}/chat",
                             {"playerId": ["1"]}, {})
    assert len(ref_chat["messages"]) == 2  # trigger + bot reply
    del ctx  # kill -9

    ctx2 = AppContext(sp, backend="native")
    _, chat2 = ctx2.handle("GET", f"/api/rooms/{rid}/chat",
                           {"playerId": ["1"]}, {})
    assert chat2["messages"] == ref_chat["messages"]
