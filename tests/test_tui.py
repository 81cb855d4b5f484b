"""Terminal UI shell (tui.py) — headless tests of the view-model and the
pure renderer (the curses driver only paints ``render_lines`` output).

Mirrors the observable behavior of the reference's result display
(``monkey_frame.cpp:1214-1282``): dedup-by-equivalency-map, hex/dec
offset mode, display byteswap of the values column, result counter,
and the worker-event-driven progress gauge
(``monkey_frame.cpp:1285-1303``)."""

import time

import numpy as np
import pytest

from monkey_moore_tpu.config import Endianness, SearchResult
from monkey_moore_tpu.tui import (
    TuiModel,
    format_values,
    render_lines,
    run_tui,
)


def res(offset, vmap, preview=""):
    r = SearchResult(offset=offset, values_map=dict(vmap))
    r.preview = preview
    return r


class TestValuesColumn:
    def test_8bit_plain(self):
        s = format_values({ord("a"): 0x61}, 1, Endianness.LITTLE)
        assert s == "a=61"

    def test_16bit_little_endian_byteswap(self):
        # ShowResults swaps display bytes into file order on LE
        # (``monkey_frame.cpp:1257-1260``)
        s = format_values({ord("a"): 0x1234}, 2, Endianness.LITTLE)
        assert s == "a=3412"

    def test_16bit_big_endian_no_swap(self):
        s = format_values({ord("a"): 0x1234}, 2, Endianness.BIG)
        assert s == "a=1234"


class TestDedupAndCounter:
    def make(self):
        m = TuiModel()
        m.results = [
            res(0x10, {97: 1, 98: 2}, "abc"),
            res(0x20, {97: 1, 98: 2}, "abd"),  # same map -> deduped
            res(0x30, {97: 5, 98: 6}, "xyz"),
        ]
        return m

    def test_dedup_by_values_map(self):
        m = self.make()
        rows = m.visible_rows()
        assert [r[1] for r in rows] == ["0x10", "0x30"]
        assert m.counter_label().startswith("2 ")

    def test_show_all(self):
        m = self.make()
        m.dedup = False
        assert len(m.visible_rows()) == 3
        assert m.counter_label().startswith("3 ")

    def test_offset_mode(self):
        m = self.make()
        m.hex_offsets = False
        assert [r[1] for r in m.visible_rows()] == ["16", "48"]


class TestKeys:
    def test_typing_and_backspace(self):
        m = TuiModel()
        for c in "mon*ey":
            m.handle_key(c)
        assert m.keyword == "mon*ey"
        m.handle_key("BACKSPACE")
        assert m.keyword == "mon*e"

    def test_selection_clamps(self):
        m = TuiModel()
        m.results = [res(i, {97: i}) for i in range(3)]
        m.handle_key("UP")
        assert m.selected == 0
        for _ in range(9):
            m.handle_key("DOWN")
        assert m.selected == 2
        m.handle_key("PGUP")
        assert m.selected == 0

    def test_toggles(self):
        m = TuiModel()
        assert m.dedup and m.hex_offsets
        m.handle_key("F2")
        m.handle_key("F3")
        m.handle_key("F4")
        m.handle_key("F5")
        assert not m.dedup and not m.hex_offsets
        assert m.element_width == 2
        assert m.endianness is Endianness.BIG

    def test_invalid_keyword_shows_validation_text(self):
        m = TuiModel(file_path="/tmp/x.bin", keyword="ab")
        m.handle_key("ENTER")
        assert "3 or more" in m.status

    def test_esc_quits_and_aborts(self):
        class FakeSearch:
            aborted = False

            def abort(self):
                self.aborted = True

        m = TuiModel()
        m.searching = True
        m.search = FakeSearch()
        m.handle_key("ESC")
        assert m.quit and m.search.aborted

    def test_abort_key(self):
        class FakeSearch:
            aborted = False

            def abort(self):
                self.aborted = True

        m = TuiModel()
        m.searching = True
        m.search = FakeSearch()
        m.handle_key("a")
        assert m.search.aborted and m.status == "aborting..."


class TestRenderer:
    def test_screen_shape_and_content(self):
        m = TuiModel(file_path="/tmp/rom.bin", keyword="monkey")
        m.results = [
            res(0x2A, {97: 3}, "monkey preview"),
            res(0x54, {97: 9}, "other"),
        ]
        m.progress_pct = 50
        lines = render_lines(m, width=78, height=20)
        assert len(lines) == 20
        assert all(len(ln) <= 78 for ln in lines)
        screen = "\n".join(lines)
        assert "/tmp/rom.bin" in screen
        assert "keyword: monkey_" in screen
        assert "0x2A" in screen and "0x54" in screen
        assert "monkey preview" in screen
        assert "2 result(s)" in screen
        # gauge half full
        gauge = lines[2]
        assert "#" in gauge and "-" in gauge and "50%" in gauge

    def test_selection_cursor_and_preview_pane(self):
        m = TuiModel()
        m.results = [res(1, {97: 1}, "first"), res(2, {97: 2}, "second")]
        m.handle_key("DOWN")
        lines = render_lines(m, width=60, height=16)
        sel = [ln for ln in lines if ln.startswith(">")]
        assert len(sel) == 1 and "0x2" in sel[0]
        assert any(ln.strip() == "second" for ln in lines)

    def test_help_screen(self):
        m = TuiModel()
        m.handle_key("F1")
        screen = "\n".join(render_lines(m))
        assert "abort running search" in screen
        m.handle_key("F1")
        assert "abort running search" not in "\n".join(render_lines(m))

    def test_scroll_follows_selection(self):
        m = TuiModel()
        m.results = [res(i, {97: i}) for i in range(1, 40)]
        for _ in range(30):
            m.handle_key("DOWN")
        lines = render_lines(m, width=60, height=16)
        assert any(ln.startswith(">") for ln in lines)


class TestEndToEnd:
    def test_search_through_async_worker(self, tmp_path):
        """Full flow: Enter launches AsyncSearch on a real file; UPDATE
        events drive the gauge; COMPLETED fills the result list."""
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, 50_000).astype(np.uint8)
        enc = np.array([ord(c) + 4 for c in "monkey"], dtype=np.uint8)
        data[700:706] = enc
        data[9000:9006] = enc
        p = tmp_path / "rom.bin"
        p.write_bytes(data.tobytes())

        m = TuiModel(file_path=str(p), keyword="monkey")
        search = m.start_search()
        assert search is not None and m.searching
        assert search.join(timeout=60)
        deadline = time.time() + 5
        while m.searching and time.time() < deadline:
            m.pump_events()
        assert not m.searching
        rows = m.visible_rows()
        # both plants share one equivalency map -> deduped to one row
        assert len(rows) == 1 and rows[0][1] == "0x2BC"
        m.handle_key("F2")  # show all
        assert [r[1] for r in m.visible_rows()] == ["0x2BC", "0x2328"]
        screen = "\n".join(render_lines(m))
        assert "100%" in screen and "0x2BC" in screen

    def test_cli_wires_tui_subcommand(self):
        from monkey_moore_tpu.cli import build_parser

        args = build_parser().parse_args(["tui", "file.bin"])
        assert args.command == "tui" and args.file == "file.bin"


class TestCursesDriver:
    def test_run_tui_importable_headless(self):
        """The driver must not touch curses at import time (CI has no
        terminal); run_tui itself needs a tty so only the wiring is
        checked here."""
        assert callable(run_tui)


class TestOpenMode:
    """F6 path entry — the runtime target-selection analog of the
    reference's drop target (``drop_target.cpp:12-22``)."""

    def test_open_existing_file(self, tmp_path):
        p = tmp_path / "new.bin"
        p.write_bytes(b"\x00" * 64)
        m = TuiModel()
        m.handle_key("F6")
        assert m.open_mode
        for c in str(p):
            m.handle_key(c)
        m.handle_key("ENTER")
        assert not m.open_mode and m.file_path == str(p)
        assert "opened" in m.status

    def test_open_missing_file(self):
        m = TuiModel(file_path="/tmp/old.bin")
        m.handle_key("F6")
        for c in "/does/not/exist":
            m.handle_key(c)
        m.handle_key("ENTER")
        assert m.file_path == "/tmp/old.bin"  # unchanged
        assert m.status == "File not found"

    def test_escape_cancels(self):
        m = TuiModel(file_path="/tmp/x.bin")
        m.handle_key("F6")
        m.handle_key("a")
        m.handle_key("ESC")
        assert not m.open_mode and not m.quit
        assert m.file_path == "/tmp/x.bin"

    def test_render_shows_path_entry(self):
        m = TuiModel()
        m.handle_key("F6")
        for c in "/tmp/ro":
            m.handle_key(c)
        lines = render_lines(m)
        assert lines[0].startswith(" open file: /tmp/ro_")

    def test_open_resets_results(self, tmp_path):
        p = tmp_path / "r.bin"
        p.write_bytes(b"\x00" * 8)
        m = TuiModel()
        m.results = [res(1, {97: 1})]
        m.handle_key("F6")
        for c in str(p):
            m.handle_key(c)
        m.handle_key("ENTER")
        assert m.results == []


class TestReviewFindings:
    """Round-5 review regressions (stale completion, input racing)."""

    def test_typing_blocked_while_searching(self):
        m = TuiModel(keyword="mon")
        m.searching = True
        m.search = object()
        m.handle_key("d")
        m.handle_key("BACKSPACE")
        assert m.keyword == "mon"
        assert "search running" in m.status

    def test_open_discards_stale_completion(self, tmp_path):
        """A late COMPLETED from the old file's worker must not fill the
        list after F6 opened a different file."""
        import queue as queue_mod

        class FakeSearch:
            aborted = False

            def abort(self):
                self.aborted = True

        pb = tmp_path / "b.bin"
        pb.write_bytes(b"\x00" * 32)
        m = TuiModel(file_path="/tmp/a.bin")
        m.searching = True
        m.search = FakeSearch()
        q = queue_mod.Queue()
        m.search_events = q
        # user opens file B while A's search runs
        m.handle_key("F6")
        m.path_input = ""
        for c in str(pb):
            m.handle_key(c)
        m.handle_key("ENTER")
        assert m.search.aborted and not m.searching
        # A's worker completes late into the OLD queue
        q.put(("completed", [res(0x999, {97: 1})]))
        m.pump_events()
        assert m.results == []  # stale rows never shown

    def test_dedup_order_keeps_first_occurrence(self):
        m = TuiModel()
        m.results = [
            res(0x30, {97: 5}), res(0x10, {97: 1}), res(0x20, {97: 5}),
        ]
        assert [r[1] for r in m.visible_rows()] == ["0x30", "0x10"]

    def test_rows_cache_invalidates_on_toggle(self):
        m = TuiModel()
        m.results = [res(0x10, {97: 1}), res(0x20, {97: 1})]
        assert len(m.visible_rows()) == 1
        m.handle_key("F2")  # show all
        assert len(m.visible_rows()) == 2
        m.handle_key("F3")  # dec offsets
        assert m.visible_rows()[0][1] == "16"


class TestUiPrefs:
    """Display-state restore/save (``monkey_frame.cpp:349-365``,
    ``monkey_app.cpp:67-72``) — shares the REPL's key names."""

    def test_round_trip(self, tmp_path):
        from monkey_moore_tpu.prefs import Prefs, load_user_prefs
        from monkey_moore_tpu.tui import apply_ui_prefs, collect_ui_prefs

        m = TuiModel()
        m.dedup = False
        m.hex_offsets = False
        m.element_width = 2
        m.endianness = Endianness.BIG
        p = Prefs()
        collect_ui_prefs(m, p)
        path = tmp_path / "config.xml"
        p.save(path)

        loaded, warning = load_user_prefs(path)
        assert warning is None
        m2 = TuiModel()
        apply_ui_prefs(m2, loaded)
        assert not m2.dedup and not m2.hex_offsets
        assert m2.element_width == 2
        assert m2.endianness is Endianness.BIG

    def test_factory_defaults_do_not_override(self, tmp_path):
        """A prefs file that never persisted a key must leave the
        model's own default untouched (the REPL's `has()` contract)."""
        from monkey_moore_tpu.prefs import Prefs, load_user_prefs
        from monkey_moore_tpu.tui import apply_ui_prefs

        path = tmp_path / "config.xml"
        p = Prefs()
        p.set("settings/display-preview-width", 30)  # unrelated key only
        p.save(path)
        loaded, _ = load_user_prefs(path)
        # strip the ui keys load_user_prefs would report as loaded
        m = TuiModel()
        m.dedup = True
        apply_ui_prefs(m, loaded)
        # saved file contains factory values for everything (Prefs()
        # pre-populates) — show-all-results default "true" -> dedup False
        # is applied ONLY because the key is genuinely in the file
        assert ("ui-state/show-all-results" in loaded.loaded_keys) == (
            not m.dedup
        )


class TestValueScanMode:
    """F7: the reference frame's second search type
    (``monkey_frame.cpp:352`` search-type radio)."""

    def test_toggle_and_field_label(self):
        m = TuiModel()
        m.handle_key("F7")
        assert m.value_scan
        lines = render_lines(m)
        assert lines[1].startswith(" values: ")
        m.handle_key("F7")
        assert not m.value_scan
        assert render_lines(m)[1].startswith(" keyword: ")

    def test_invalid_values_show_warning(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"\x00" * 64)
        m = TuiModel(file_path=str(p), keyword="12 potato")
        m.value_scan = True
        m.handle_key("ENTER")
        assert "non-negative decimal" in m.status

    def test_end_to_end_value_scan(self, tmp_path):
        data = np.zeros(4096, dtype=np.uint8)
        seq = np.array([140, 130, 120, 110], dtype=np.uint8)
        data[100:104] = seq
        data[2000:2004] = seq + 50
        p = tmp_path / "vs.bin"
        p.write_bytes(data.tobytes())
        m = TuiModel(file_path=str(p), keyword="40 30 20 10")
        m.value_scan = True
        search = m.start_search()
        assert search is not None
        assert search.join(timeout=60)
        deadline = time.time() + 5
        while m.searching and time.time() < deadline:
            m.pump_events()
        offs = [r[1] for r in m.visible_rows()]
        # value-scan maps are empty -> dedup keeps the FIRST row only
        # (the reference's unique filter sees equal empty maps)
        assert offs == ["0x64"]
        m.handle_key("F2")  # show all
        assert [r[1] for r in m.visible_rows()] == ["0x64", "0x7D0"]

    def test_prefs_round_trip_search_type(self, tmp_path):
        from monkey_moore_tpu.prefs import Prefs, load_user_prefs
        from monkey_moore_tpu.tui import apply_ui_prefs, collect_ui_prefs

        m = TuiModel()
        m.value_scan = True
        p = Prefs()
        collect_ui_prefs(m, p)
        path = tmp_path / "c.xml"
        p.save(path)
        loaded, _w = load_user_prefs(path)
        m2 = TuiModel()
        apply_ui_prefs(m2, loaded)
        assert m2.value_scan


class TestCustomSequenceMode:
    """F8: the reference frame's charset field + named-sequence store
    (``monkey_frame.cpp`` advanced panel; ``constants.hpp:48-49``)."""

    def _type(self, m, text):
        for c in text:
            m.handle_key(c)

    def test_literal_sequence_set_and_clear(self):
        m = TuiModel()
        m.handle_key("F8")
        assert m.seq_mode
        self._type(m, "aiueo")
        m.handle_key("ENTER")
        assert m.char_seq == "aiueo" and not m.seq_mode
        m.handle_key("F8")
        for _ in range(9):
            m.handle_key("BACKSPACE")
        m.handle_key("ENTER")
        assert m.char_seq == "" and "cleared" in m.status

    def test_named_sequence_lookup(self):
        from monkey_moore_tpu.sequences import DEFAULT_HIRAGANA

        m = TuiModel()
        m.handle_key("F8")
        self._type(m, "@hiragana")
        m.handle_key("ENTER")
        assert m.char_seq == DEFAULT_HIRAGANA
        m.handle_key("F8")
        m.seq_input = "@nosuchseq"
        m.handle_key("ENTER")
        assert m.char_seq == DEFAULT_HIRAGANA  # unchanged
        assert "no sequence matching" in m.status

    def test_escape_cancels(self):
        m = TuiModel()
        m.char_seq = "abc"
        m.handle_key("F8")
        self._type(m, "zzz")
        m.handle_key("ESC")
        assert m.char_seq == "abc" and not m.seq_mode

    def test_validation_uses_sequence(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"\x00" * 64)
        m = TuiModel(file_path=str(p), keyword="xyz")
        m.char_seq = "aiueo"  # keyword chars not in sequence
        m.handle_key("ENTER")
        assert "defined charset" in m.status

    def test_end_to_end_sequence_search(self, tmp_path):
        from monkey_moore_tpu.sequences import DEFAULT_HIRAGANA

        seq = DEFAULT_HIRAGANA
        idx = {c: i for i, c in enumerate(seq)}
        kw = seq[1] + seq[3] + seq[5] + seq[2]
        data = np.zeros(4096, dtype=np.uint8)
        enc = np.array([(idx[c] + 40) % 256 for c in kw], dtype=np.uint8)
        data[512 : 512 + 4] = enc
        p = tmp_path / "kana.bin"
        p.write_bytes(data.tobytes())
        m = TuiModel(file_path=str(p), keyword=kw)
        m.handle_key("F8")
        self._type(m, "@hiragana")
        m.handle_key("ENTER")
        search = m.start_search()
        assert search is not None and search.join(timeout=60)
        deadline = time.time() + 5
        while m.searching and time.time() < deadline:
            m.pump_events()
        offs = [r[1] for r in m.visible_rows()]
        assert "0x200" in offs
        # header shows the active sequence tag
        assert f"seq[{len(seq)}]" in render_lines(m)[1]


class TestPrefsContract:
    """Round-5 review regressions: the TUI must not make factory defaults
    look user-persisted, and must speak the reference's on-disk
    vocabulary."""

    def test_search_type_uses_reference_vocabulary(self, tmp_path):
        # the reference writes "rs"/"vsr" (monkey_frame.cpp:878)
        from monkey_moore_tpu.prefs import Prefs, load_user_prefs
        from monkey_moore_tpu.tui import apply_ui_prefs, collect_ui_prefs

        m = TuiModel()
        m.value_scan = True
        p = Prefs()
        collect_ui_prefs(m, p)
        assert p.get("ui-state/search-type") == "vsr"
        # a reference-written file restores value-scan mode
        path = tmp_path / "ref.xml"
        p2 = Prefs()
        p2.set("ui-state/search-type", "vsr")
        p2.save(path)
        loaded, _ = load_user_prefs(path)
        m2 = TuiModel()
        apply_ui_prefs(m2, loaded)
        assert m2.value_scan

    def test_offset_mode_polarity_matches_repl(self, tmp_path):
        # anything but the exact "dec" means hex (repl.py normalization)
        from monkey_moore_tpu.prefs import Prefs, load_user_prefs
        from monkey_moore_tpu.tui import apply_ui_prefs

        path = tmp_path / "odd.xml"
        p = Prefs()
        p.set("settings/display-offset-mode", "hexadecimal")
        p.save(path)
        loaded, _ = load_user_prefs(path)
        m = TuiModel()
        m.hex_offsets = False
        apply_ui_prefs(m, loaded)
        assert m.hex_offsets  # unexpected value -> hex, like the REPL

    def test_exit_save_does_not_persist_factory_defaults(
        self, tmp_path, monkeypatch
    ):
        """A TUI session against a fresh prefs path must write ONLY the
        TUI-owned display keys — writing the factory map would make the
        GUI's 8 MiB perf-memory-pool look user-persisted and override
        the REPL's 512 KiB engine default on its next load."""
        import curses as _curses

        from monkey_moore_tpu import tui as tui_mod
        from monkey_moore_tpu.prefs import load_user_prefs

        path = tmp_path / "fresh.xml"

        # run the curses driver headless: fake stdscr that quits at once
        class FakeScr:
            def getmaxyx(self):
                return (24, 80)

            def addstr(self, *a):
                pass

            def refresh(self):
                pass

            def nodelay(self, *_):
                pass

            def timeout(self, *_):
                pass

            def getch(self):
                return 27  # ESC

        monkeypatch.setattr(_curses, "curs_set", lambda *_: None,
                            raising=False)
        for name, val in (
            ("KEY_ENTER", 343), ("KEY_UP", 259), ("KEY_DOWN", 258),
            ("KEY_PPAGE", 339), ("KEY_NPAGE", 338),
            ("KEY_BACKSPACE", 263), ("KEY_F1", 265), ("KEY_F2", 266),
            ("KEY_F3", 267), ("KEY_F4", 268), ("KEY_F5", 269),
            ("KEY_F6", 270), ("KEY_F7", 271), ("KEY_F8", 272),
        ):
            monkeypatch.setattr(_curses, name, val, raising=False)
        rc = tui_mod.run_tui(None, "", stdscr=FakeScr(),
                             prefs_path=path)
        assert rc == 0 and path.exists()
        loaded, warning = load_user_prefs(path)
        assert warning is None
        assert "settings/perf-memory-pool" not in loaded.loaded_keys
        assert "settings/perf-search-threads" not in loaded.loaded_keys
        assert "ui-state/show-all-results" in loaded.loaded_keys
        # the REPL's own keys survive a TUI round trip when present
        from monkey_moore_tpu.prefs import Prefs

        p = Prefs()
        p.set("settings/perf-search-threads", 7)
        p.save(path)
        tui_mod.run_tui(None, "", stdscr=FakeScr(), prefs_path=path)
        loaded2, _ = load_user_prefs(path)
        assert loaded2.get_int("settings/perf-search-threads") == 7


class TestOpenDirectoryMemory:
    """directories/open-file parity (``monkey_frame.cpp:396,413``): the
    last-opened directory persists and prefills the F6 path entry."""

    def test_open_records_directory_and_prefills(self, tmp_path):
        p = tmp_path / "sub" / "rom.bin"
        p.parent.mkdir()
        p.write_bytes(b"\x00" * 32)
        m = TuiModel()
        m.handle_key("F6")
        for c in str(p):
            m.handle_key(c)
        m.handle_key("ENTER")
        assert m.last_dir == str(p.parent.resolve())
        # a fresh model with the pref restored prefills F6 entry
        from monkey_moore_tpu.prefs import Prefs, load_user_prefs
        from monkey_moore_tpu.tui import apply_ui_prefs, collect_ui_prefs

        store = Prefs()
        collect_ui_prefs(m, store)
        path = tmp_path / "c.xml"
        store.save(path)
        loaded, _ = load_user_prefs(path)
        m2 = TuiModel()
        apply_ui_prefs(m2, loaded)
        assert m2.last_dir == str(p.parent.resolve())
        m2.handle_key("F6")
        assert m2.path_input == str(p.parent.resolve()) + "/"

    def test_repl_records_and_persists_open_dir(self, tmp_path):
        from monkey_moore_tpu.prefs import load_user_prefs
        from monkey_moore_tpu.repl import Repl

        rom = tmp_path / "dir" / "x.bin"
        rom.parent.mkdir()
        rom.write_bytes(b"\x00" * 16)
        prefs_path = tmp_path / "prefs.xml"
        import io

        r = Repl(out=io.StringIO(), prefs_path=str(prefs_path))
        r.execute(f"open {rom}")
        r.save_user_prefs()
        loaded, _ = load_user_prefs(prefs_path)
        assert loaded.get("directories/open-file") == str(
            rom.parent.resolve()
        )
        # a REPL session that never opened a file must not clobber it
        r2 = Repl(out=io.StringIO(), prefs_path=str(prefs_path))
        assert r2.open_dir == str(rom.parent.resolve())
