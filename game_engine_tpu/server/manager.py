"""GameHost: interactive rooms hosted inside one batched engine state.

The reference binds one LangGraph thread per room and re-runs a 4-LLM
pipeline per turn (reference: src/app/api/rooms/create/route.ts:16-26,
SURVEY.md §3.2). Here every live room of a game occupies a slot in a single
batched GameState; a turn is one fused engine step applied only to the
requesting room (other slots are frozen via masked select). Human actions
arrive asynchronously into a host-side queue and are merged with on-device
bot-policy actions on the next step — the host/device action-queue design
from SURVEY.md §7. Player 1 is the human: the bot policy never emits for
them (reference: agent/prompt/bot_behavior_system_prompt.txt, ABSOLUTE
HUMAN EXCLUSION).
"""

from __future__ import annotations

import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from game_engine_tpu.core.engine import BatchedEngine
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import GameConfig, compile_game
from game_engine_tpu.gamespec.mechanics import ChoiceKind
from game_engine_tpu.gamespec.parser import games_dir, load_game_spec
from game_engine_tpu.gamespec.tables import Lowered, lower
from game_engine_tpu.view.decode import decode_room
from game_engine_tpu.view.project import Projector

import os

SLOTS_PER_GAME = 64


class _GameSlots:
    """Batched engine state + slot allocation for one compiled game."""

    def __init__(self, lowered: Lowered, capacity: int = SLOTS_PER_GAME):
        self.lowered = lowered
        self.engine = BatchedEngine(lowered)
        self.capacity = capacity
        self.state = init_state(
            lowered, capacity, lowered.P, np.arange(capacity, dtype=np.uint32)
        )
        self.free = list(range(capacity))
        self.projectors: dict[int, Projector] = {}
        self.items: dict[int, list] = {}
        self.prev_dead: dict[int, list] = {}

    def alloc(self, n_players: int, seed: int) -> int:
        slot = self.free.pop(0)
        fresh = init_state(self.lowered, 1, n_players, np.uint32(seed))
        self.state = jax.tree_util.tree_map(
            lambda full, one: full.at[slot].set(one[0]), self.state, fresh
        )
        self.projectors[slot] = Projector(self.lowered.game)
        self.items[slot] = []
        self.prev_dead[slot] = []
        return slot

    def release(self, slot: int) -> None:
        self.free.append(slot)
        self.projectors.pop(slot, None)
        self.items.pop(slot, None)
        self.prev_dead.pop(slot, None)

    def step_slot(self, slot: int, human_actions: dict[int, int],
                  include_bots: bool = True) -> None:
        """Advance only this slot by one engine step (others frozen)."""
        bots = self.engine.bot_actions(self.state) if include_bots else jnp.zeros(
            (self.capacity, self.lowered.P), jnp.int32
        )
        # human exclusion: policy never acts for player 1
        actions = np.asarray(bots).copy()
        actions[:, 0] = 0
        for pid, choice in human_actions.items():
            if 1 <= pid <= self.lowered.P:
                actions[slot, pid - 1] = int(choice)
        new_state = self.engine.step(self.state, jnp.asarray(actions))
        keep = np.zeros((self.capacity,), bool)
        keep[slot] = True
        keep_j = jnp.asarray(keep)
        self.state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                keep_j.reshape((-1,) + (1,) * (old.ndim - 1)), new, old
            ),
            new_state,
            self.state,
        )

    # backend-agnostic accessors used by GameHost
    def snapshot_raw(self, slot: int, names) -> dict[str, Any]:
        return decode_room(self.lowered, self.state, slot, names)

    def is_done(self, slot: int) -> bool:
        return bool(self.state.done[slot])

    def phase_index(self, slot: int) -> int:
        return int(self.state.phase[slot])

    def alive_ids(self, slot: int) -> list[int]:
        present = np.asarray(self.state.present[slot])
        if self.lowered.alive_bool >= 0:
            alive = np.asarray(self.state.bools[slot, :, self.lowered.alive_bool]) & present
        else:
            alive = present
        return [p + 1 for p in range(len(alive)) if alive[p]]

    def human_must_act(self, slot: int) -> bool:
        from game_engine_tpu.core.step import PredEval

        lowered = self.lowered
        phase = self.phase_index(slot)
        if not bool(lowered.phase_is_action[phase]):
            return False
        pe = PredEval(lowered, self.state)
        tgt = np.asarray(pe.pred(int(lowered.phase_target_pred[phase])))[slot]
        acted = np.asarray(self.state.acted[slot])
        return bool(tgt[0] and not acted[0])


class _NativeRooms:
    """Native (C++) backend: one CppRoom per slot — sub-microsecond steps
    for the interactive path, no device dispatch. Bit-identical semantics
    (tests/test_native.py)."""

    def __init__(self, lowered: Lowered, capacity: int = SLOTS_PER_GAME):
        from game_engine_tpu.native import CppGame

        self.lowered = lowered
        self.game = CppGame(lowered)
        self.capacity = capacity
        self.free = list(range(capacity))
        self.rooms: dict[int, Any] = {}
        self.n_players: dict[int, int] = {}
        self.projectors: dict[int, Projector] = {}
        self.items: dict[int, list] = {}
        self.prev_dead: dict[int, list] = {}

    def alloc(self, n_players: int, seed: int) -> int:
        slot = self.free.pop(0)
        self.rooms[slot] = self.game.room(n_players, seed)
        self.n_players[slot] = n_players
        self.projectors[slot] = Projector(self.lowered.game)
        self.items[slot] = []
        self.prev_dead[slot] = []
        return slot

    def release(self, slot: int) -> None:
        self.free.append(slot)
        for d in (self.rooms, self.n_players, self.projectors, self.items, self.prev_dead):
            d.pop(slot, None)

    def step_slot(self, slot: int, human_actions: dict[int, int],
                  include_bots: bool = True) -> None:
        room = self.rooms[slot]
        actions = room.policy_actions() if include_bots else {}
        actions.pop(1, None)  # human exclusion
        actions.update(human_actions)
        room.step(actions)

    def snapshot_raw(self, slot: int, names) -> dict[str, Any]:
        from game_engine_tpu.view.decode import decode_native

        return decode_native(self.lowered, self.rooms[slot].read(),
                             self.n_players[slot], names)

    def is_done(self, slot: int) -> bool:
        return bool(self.rooms[slot].read()["done"])

    def phase_index(self, slot: int) -> int:
        return int(self.rooms[slot].read()["phase_index"])

    def alive_ids(self, slot: int) -> list[int]:
        r = self.rooms[slot].read()
        n = self.n_players[slot]
        if self.lowered.alive_bool >= 0:
            return [p + 1 for p in range(n) if r["bools"][p, self.lowered.alive_bool]]
        return list(range(1, n + 1))

    def human_must_act(self, slot: int) -> bool:
        room = self.rooms[slot]
        r = room.read()
        phase = r["phase_index"]
        if not bool(self.lowered.phase_is_action[phase]):
            return False
        if r["acted"][0]:
            return False
        # targeted iff the scripted policy would emit for player 1
        from game_engine_tpu.gamespec.expr import eval_predicate
        from game_engine_tpu.view.decode import decode_native

        snap = decode_native(self.lowered, r, self.n_players[slot])
        cp = self.lowered.game.phases[phase]
        return eval_predicate(cp.target_pred, snap["player_states"]["1"])


class GameHost:
    """Rooms -> engine slots; human action queues; state/items projection."""

    def __init__(self, games_path: Optional[str] = None, backend: str = "jax"):
        """backend: 'jax' (batched device engine) or 'native' (C++ per-room
        simulator — lowest interactive latency, identical semantics)."""
        self._lock = threading.RLock()
        self._backend = backend
        self._games_path = games_path or games_dir()
        self._slots: dict[str, _GameSlots] = {}
        self._rooms: dict[str, tuple[str, int]] = {}  # roomId -> (game, slot)
        self._queues: dict[str, dict[int, int]] = {}  # roomId -> {pid: choice}
        self._chats: dict[str, Any] = {}
        self._notes: dict[str, Any] = {}
        self._phase_history: dict[str, list] = {}
        self._seeds = 0

    # -- game catalog ----------------------------------------------------------

    def list_games(self) -> list[dict[str, Any]]:
        """Scan games/*.yaml (reference: src/app/api/games/route.ts:13-56)."""
        out = []
        for fn in sorted(os.listdir(self._games_path)):
            if not fn.endswith((".yaml", ".yml")):
                continue
            try:
                spec = load_game_spec(os.path.join(self._games_path, fn))
            except Exception:
                continue
            out.append(
                {
                    "name": spec.name,
                    "description": spec.declaration.description[:200],
                    "isMultiplayer": spec.declaration.is_multiplayer,
                    "minPlayers": spec.declaration.min_players,
                    "filename": fn,
                }
            )
        return out

    def _game_slots(self, game_name: str, rounds_per_player: int = 1) -> _GameSlots:
        key = f"{game_name}#r{rounds_per_player}"
        if key not in self._slots:
            spec = None
            for fn in sorted(os.listdir(self._games_path)):
                if fn.endswith((".yaml", ".yml")):
                    s = load_game_spec(os.path.join(self._games_path, fn))
                    if s.name == game_name or game_name.lower() in s.name.lower():
                        spec = s
                        break
            if spec is None:
                raise KeyError(f"unknown game {game_name!r}")
            lowered = lower(compile_game(spec, GameConfig(rounds_per_player=rounds_per_player)))
            cls = _NativeRooms if self._backend == "native" else _GameSlots
            self._slots[key] = cls(lowered)
        return self._slots[key]

    # -- room lifecycle ---------------------------------------------------------

    def start_room(self, room_id: str, game_name: str, n_players: int,
                   seed: Optional[int] = None, rounds_per_player: int = 1) -> str:
        with self._lock:
            key = f"{game_name}#r{rounds_per_player}"
            gs = self._game_slots(game_name, rounds_per_player)
            if not gs.free:
                # pool exhausted: reclaim slots of finished rooms (viewing a
                # finished game is best-effort once capacity is needed)
                for rid, (k, s) in list(self._rooms.items()):
                    if k == key and gs.is_done(s):
                        self.end_room(rid)
                        if gs.free:
                            break
                if not gs.free:
                    raise ValueError(f"no free game slots for {game_name!r}")
            self._seeds += 1
            real_seed = seed if seed is not None else self._seeds
            slot = gs.alloc(n_players, real_seed)
            self._rooms[room_id] = (key, slot)
            self._queues[room_id] = {}
            from game_engine_tpu.server.chat import ChatRoom
            from game_engine_tpu.view.notes import NotesLog

            self._chats[room_id] = ChatRoom(room_id, seed=real_seed)
            self._notes[room_id] = NotesLog()
            self._phase_history[room_id] = []
            return f"{game_name}:{slot}"

    def end_room(self, room_id: str) -> None:
        with self._lock:
            slots_key, slot = self._rooms.pop(room_id, (None, None))
            self._queues.pop(room_id, None)
            self._chats.pop(room_id, None)
            self._notes.pop(room_id, None)
            self._phase_history.pop(room_id, None)
            if slots_key is not None:
                self._slots[slots_key].release(slot)

    # -- chat ---------------------------------------------------------------------

    def post_chat(self, room_id: str, player_id: int, text: str,
                  player_names: Optional[dict[int, str]] = None) -> list[dict[str, Any]]:
        """Append a chat message and generate the bot reply; returns the new
        messages (reference flow: page.tsx:321-351 -> ChatBotNode)."""
        with self._lock:
            chat = self._chats[room_id]
            names = player_names or {}
            sender_name = names.get(player_id, f"Player {player_id}")
            msg = chat.post(player_id, sender_name, text)
            slots_key, slot = self._rooms[room_id]
            gs = self._slots[slots_key]
            snap = gs.snapshot_raw(slot, names)
            reply = chat.bot_reply(player_id, sender_name, text, snap)
            out = [msg.to_json()]
            if reply is not None:
                out.append(reply.to_json())
            return out

    def chat_messages(self, room_id: str, viewer_id: int) -> list[dict[str, Any]]:
        with self._lock:
            chat = self._chats.get(room_id)
            return [m.to_json() for m in chat.visible(viewer_id)] if chat else []

    def game_notes(self, room_id: str, n: int = 50) -> list[dict[str, Any]]:
        with self._lock:
            log = self._notes.get(room_id)
            return log.recent(n) if log else []

    # -- play -------------------------------------------------------------------

    def queue_action(self, room_id: str, player_id: int, choice: int) -> None:
        """Async human input (vote click, text submit, chat-driven action).

        Out-of-int32 choices become 0 (= no action) instead of overflowing
        the engine's int32 action arrays."""
        with self._lock:
            c = int(choice)
            if not (-(2**31) <= c < 2**31):
                c = 0
            self._queues.setdefault(room_id, {})[int(player_id)] = c

    def queue_vote(self, room_id: str, player_id: int, option_index: int) -> None:
        """Vote by option index (1-based position in the rendered panel).

        TARGET panels list alive players in id order, so option k maps to the
        k-th alive player; OPTION panels map straight through.
        """
        with self._lock:
            slots_key, slot = self._rooms[room_id]
            gs = self._slots[slots_key]
            kind = int(gs.lowered.choice_kind[gs.phase_index(slot)])
            if kind == ChoiceKind.TARGET.value:
                ids = gs.alive_ids(slot)
                choice = ids[option_index - 1] if 1 <= option_index <= len(ids) else 0
            else:
                choice = option_index
            self.queue_action(room_id, player_id, choice)

    def step(self, room_id: str) -> dict[str, Any]:
        """One game turn: merge queued human actions + bot policy, advance."""
        with self._lock:
            slots_key, slot = self._rooms[room_id]
            gs = self._slots[slots_key]
            q = self._queues.get(room_id, {})
            self._queues[room_id] = {}
            gs.step_slot(slot, q)
            self._record_phase(room_id, gs, slot)
            return self.snapshot(room_id)

    def run_until_input_needed(self, room_id: str, max_steps: int = 64) -> dict[str, Any]:
        """Advance until the human (player 1) must act or the game ends —
        the 'Continue' button semantics without manual clicking through
        bot-only phases."""
        with self._lock:
            slots_key, slot = self._rooms[room_id]
            gs = self._slots[slots_key]
            for _ in range(max_steps):
                q = self._queues.get(room_id, {})
                self._queues[room_id] = {}
                gs.step_slot(slot, q)
                self._record_phase(room_id, gs, slot)
                if gs.is_done(slot) or gs.human_must_act(slot):
                    break
            return self.snapshot(room_id)

    def _record_phase(self, room_id: str, gs, slot: int) -> None:
        """Lightweight phase_history tracking for phases crossed inside a
        multi-step 'continue' (reference: phase_history is appended on every
        PhaseNode transition, game_agent_v2.py:1206-1215)."""
        import time as _time

        hist = self._phase_history.setdefault(room_id, [])
        cp = gs.lowered.game.phases[gs.phase_index(slot)]
        if not hist or hist[-1]["phase_id"] != cp.dsl_id:
            hist.append({"phase_id": cp.dsl_id, "phase_name": cp.name,
                         "timestamp": _time.time()})

    # -- projection ---------------------------------------------------------------

    def snapshot(self, room_id: str, player_names: Optional[dict[int, str]] = None) -> dict[str, Any]:
        with self._lock:
            slots_key, slot = self._rooms[room_id]
            gs = self._slots[slots_key]
            snap = gs.snapshot_raw(slot, player_names)
            snap["roomId"] = room_id
            # phase_history entries {phase_id, phase_name, timestamp}
            # (reference: agent/game_agent_v2.py:1206-1215)
            self._record_phase(room_id, gs, slot)
            snap["phase_history"] = list(self._phase_history.get(room_id, []))
            log = self._notes.get(room_id)
            if log is not None:
                log.observe(snap)
                snap["game_notes"] = log.recent(10)
            proj = gs.projectors[slot]
            gs.items[slot] = proj.project(
                snap, prev_items=gs.items[slot], prev_dead=gs.prev_dead[slot]
            )
            gs.prev_dead[slot] = list(snap.get("deadPlayers", []))
            snap["items"] = [i.to_json() for i in gs.items[slot]]
            snap["itemsCreated"] = len(snap["items"])
            snap["lastAction"] = (
                snap["game_notes"][-1]["text"] if snap.get("game_notes") else ""
            )
            return snap

    def visible_state(self, room_id: str, viewer_id: int,
                      player_names: Optional[dict[int, str]] = None,
                      mask_private: bool = True) -> dict[str, Any]:
        """AgentState filtered for one viewer: items by the audience gate,
        and (an upgrade over the reference, which syncs full player_states
        to every client) private fields masked by the game's information
        rules — hidden roles stay hidden from the other seats."""
        from game_engine_tpu.view.cards import visible_to, Item

        snap = self.snapshot(room_id, player_names)
        snap["items"] = [
            it for it in snap["items"]
            if visible_to(Item(id=it["id"], type=it["type"], name=it["name"],
                               subtitle=it.get("subtitle", ""), data=it["data"]),
                          str(viewer_id))
        ]
        if mask_private:
            from game_engine_tpu.policies.net import (
                VIS_SELF,
                VIS_TEAM,
                field_visibility,
                minority_team_code,
            )

            slots_key, slot = self._rooms[room_id]
            lowered = self._slots[slots_key].lowered
            vis = field_visibility(lowered)
            code = minority_team_code(lowered)
            team_slot = lowered.game.layout.get("team")
            minority = team_slot.decode(code) if (code is not None and team_slot) else None
            players = snap.get("player_states", {})
            my_team = players.get(str(viewer_id), {}).get("team")
            for pid, row in players.items():
                if pid == str(viewer_id):
                    continue
                # only the coordinating minority team sees its teammates
                coordinated = (
                    bool(my_team) and row.get("team") == my_team and my_team == minority
                )
                for field, v in vis.items():
                    if field not in row:
                        continue
                    if v == VIS_SELF or (v == VIS_TEAM and not coordinated):
                        row[field] = None
        return snap
