"""L5 UX-parity tests: validation rules, Thingy-table export, sequence
store, prefs round-trip, and the CLI end-to-end."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from monkey_moore_tpu.config import Endianness
from monkey_moore_tpu.prefs import Prefs, PrefsError
from monkey_moore_tpu.sequences import (
    DEFAULT_HIRAGANA,
    DEFAULT_KATAKANA,
    SequenceStore,
)
from monkey_moore_tpu.tables import build_table_data, format_tbl, save_tbl
from monkey_moore_tpu.validate import (
    Warning_,
    check_keyword,
    check_wildcard_field,
    parse_value_scan,
    ValidationError,
)


class TestValidation:
    # rules from ``monkey_frame.cpp:1027-1138``
    def test_too_short(self):
        assert check_keyword("ab") is Warning_.KWORDSIZE

    def test_plain_ok(self):
        assert check_keyword("catch") is None

    def test_mixed_case_needs_three_of_one_case(self):
        assert check_keyword("AbCd") is Warning_.KWORDCAPLETTERS
        assert check_keyword("ABCd") is None

    def test_needs_three_letters_excluding_wildcards(self):
        assert check_keyword("ab**", "*") is Warning_.KWORDLETTERS

    def test_only_letters_and_wildcards(self):
        assert check_keyword("ab1de") is Warning_.KWORDINVALIDCHARS
        assert check_keyword("ab*de", "*") is None

    def test_custom_seq_nonwildcard_minimum(self):
        assert (
            check_keyword("あ**", "*", DEFAULT_HIRAGANA)
            is Warning_.KWORDNONWILDCARD
        )

    def test_custom_seq_wildcard_collision(self):
        assert (
            check_keyword("あいう*", "あ", DEFAULT_HIRAGANA)
            is Warning_.CHARPATWILDCARD
        )

    def test_custom_seq_duplicates(self):
        assert check_keyword("abc", "*", "aab c") is Warning_.CHARPATDUPLICATED

    def test_keyword_must_be_subset_of_seq(self):
        assert (
            check_keyword("あいx", "*", DEFAULT_HIRAGANA)
            is Warning_.KWORDCPMISMATCH
        )
        assert check_keyword("あいう", "*", DEFAULT_HIRAGANA) is None

    def test_wildcard_field(self):
        assert check_wildcard_field(True, "") is Warning_.NOWC
        assert check_wildcard_field(True, "**") is Warning_.MANYWC
        assert check_wildcard_field(True, "*") is None
        assert check_wildcard_field(False, "") is None

    def test_value_scan_parse(self):
        assert parse_value_scan("60 61, 62") == [60, 61, 62]
        with pytest.raises(ValidationError):
            parse_value_scan("60 -1")
        with pytest.raises(ValidationError):
            parse_value_scan("abc")


class TestTables:
    def test_ascii_expansion_8bit(self):
        table = build_table_data({ord("a"): 0x70, ord("A"): 0x50}, 1)
        assert table["70"] == "a"
        assert table["89"] == "z"
        assert table["50"] == "A"
        assert table["69"] == "Z"
        assert len(table) == 52

    def test_wraparound_at_type_max(self):
        # 'a' at 0xF0: letters past 0xFF wrap to 0x00
        # (``table_creator.cpp:176-177``)
        table = build_table_data({ord("a"): 0xF0}, 1)
        assert table["F0"] == "a"
        assert table["FF"] == "p"
        assert table["00"] == "q"
        assert table["09"] == "z"

    def test_16bit_little_endian_display_swap(self):
        # LE element 0x1234 is stored as bytes 34 12 → key "3412"
        table = build_table_data({0x3042: 0x1234}, 2, Endianness.LITTLE)
        assert table == {"3412": "あ"}

    def test_16bit_big_endian_no_swap(self):
        table = build_table_data({0x3042: 0x1234}, 2, Endianness.BIG)
        assert table == {"1234": "あ"}

    def test_format_crlf(self):
        assert format_tbl({"41": "A", "42": "B"}) == "41=A\r\n42=B\r\n"

    def test_save_ansi_rejects_non_ansi(self, tmp_path):
        with pytest.raises(ValueError):
            save_tbl(tmp_path / "t.tbl", {"41": "あ"}, "ansi")

    def test_save_encodings(self, tmp_path):
        save_tbl(tmp_path / "a.tbl", {"41": "A"}, "ansi")
        assert (tmp_path / "a.tbl").read_bytes() == b"41=A\r\n"
        save_tbl(tmp_path / "u.tbl", {"41": "あ"}, "utf-8")
        assert (tmp_path / "u.tbl").read_bytes() == "41=あ\r\n".encode()
        save_tbl(tmp_path / "w.tbl", {"41": "あ"}, "utf-16")
        assert (tmp_path / "w.tbl").read_bytes().decode("utf-16") == "41=あ\r\n"


class TestSequences:
    def test_defaults(self):
        store = SequenceStore()
        assert store.names() == [
            "Default Hiragana sequence",
            "Default Katakana sequence",
        ]
        assert store.get("Default Hiragana sequence") == DEFAULT_HIRAGANA
        assert len(DEFAULT_HIRAGANA) == 49
        assert len(DEFAULT_KATAKANA) == 49

    def test_round_trip(self, tmp_path):
        store = SequenceStore()
        store.add("My order", "xyzabc")
        store.save(tmp_path / "seqs.xml")
        other = SequenceStore()
        other.load(tmp_path / "seqs.xml")
        assert other.items() == store.items()

    def test_load_bad_file_keeps_current(self, tmp_path):
        (tmp_path / "bad.xml").write_text("not xml <<<")
        store = SequenceStore()
        store.load(tmp_path / "bad.xml")
        assert len(store.names()) == 2


class TestPrefs:
    def test_defaults(self):
        p = Prefs()
        assert p.get_int("settings/perf-memory-pool") == 8388608
        assert p.get_int("settings/perf-search-threads") == 4
        assert p.get("settings/display-offset-mode") == "hex"

    def test_round_trip(self, tmp_path):
        p = Prefs()
        p.set("settings/display-preview-width", 33)
        p.set("ui-state/endianness-little", False)
        p.save(tmp_path / "config.xml")
        q = Prefs()
        q.load(tmp_path / "config.xml")
        assert q.get_int("settings/display-preview-width") == 33
        assert not q.get_bool("ui-state/endianness-little")

    def test_settings_bounds_on_set(self):
        """UI-bounded knobs clamp like the settings dialog's spin controls:
        preview 20-50, pool 1-64 MB, threads 1-16
        (``src/gui/dialogs/settings.cpp:50,64,74``)."""
        p = Prefs()
        p.set("settings/display-preview-width", 5)
        assert p.get_int("settings/display-preview-width") == 20
        p.set("settings/display-preview-width", 200)
        assert p.get_int("settings/display-preview-width") == 50
        p.set("settings/perf-memory-pool", 1)
        assert p.get_int("settings/perf-memory-pool") == 1024 * 1024
        p.set("settings/perf-memory-pool", 1 << 30)
        assert p.get_int("settings/perf-memory-pool") == 64 * 1024 * 1024
        p.set("settings/perf-search-threads", 0)
        assert p.get_int("settings/perf-search-threads") == 1
        p.set("settings/perf-search-threads", 99)
        assert p.get_int("settings/perf-search-threads") == 16
        # unbounded keys pass through untouched
        p.set("settings/perf-device-chunk", 123)
        assert p.get_int("settings/perf-device-chunk") == 123

    def test_settings_bounds_on_load(self, tmp_path):
        """A hand-edited XML cannot smuggle out-of-range knobs past the
        typed accessors."""
        p = Prefs()
        p.values["settings/perf-search-threads"] = "500"
        p.save(tmp_path / "config.xml")
        q = Prefs()
        q.load(tmp_path / "config.xml")
        assert q.get_int("settings/perf-search-threads") == 16

    def test_config_clamp_ui_bounds(self):
        from monkey_moore_tpu.config import SearchConfig

        cfg = SearchConfig(
            keyword="abc",
            preferred_preview_width=7,
            preferred_search_block_size=8,
            preferred_num_threads=64,
        )
        c = cfg.clamp_ui_bounds()
        assert c.preferred_preview_width == 20
        assert c.preferred_search_block_size == 1024 * 1024
        assert c.preferred_num_threads == 16
        # 0 = auto survives; library-level values on the original untouched
        assert SearchConfig(keyword="abc").clamp_ui_bounds(
        ).preferred_num_threads == 0
        assert cfg.preferred_search_block_size == 8

    def test_load_user_prefs_recovery(self, tmp_path):
        """``load_user_prefs`` mirrors the app bootstrap
        (``monkey_app.cpp:79-113``): missing file -> silent defaults;
        corrupt file -> defaults + the error text to surface."""
        from monkey_moore_tpu.prefs import load_user_prefs

        prefs, warn = load_user_prefs(tmp_path / "missing.xml")
        assert warn is None
        assert prefs.get_int("settings/perf-search-threads") == 4

        (tmp_path / "bad.xml").write_text("garbage")
        prefs, warn = load_user_prefs(tmp_path / "bad.xml")
        assert warn and "preferences" in warn
        assert prefs.get_int("settings/perf-search-threads") == 4

    def test_search_config_from_prefs(self, tmp_path):
        """The GUI's prefs->SearchConfig flow (``monkey_frame.cpp:555-565``)
        with dialog bounds applied end to end."""
        from monkey_moore_tpu.prefs import search_config_from_prefs

        p = Prefs()
        p.values["settings/perf-memory-pool"] = str(1 << 30)  # hand-edited
        p.values["settings/display-preview-width"] = "7"
        cfg = search_config_from_prefs(p, keyword="monkey", element_width=2)
        assert cfg.preferred_search_block_size == 64 * 1024 * 1024
        assert cfg.preferred_preview_width == 20
        assert cfg.preferred_num_threads == 4
        assert cfg.keyword == "monkey" and cfg.element_width == 2

    def test_repl_prefs_round_trip(self, tmp_path):
        """REPL session state persists like the reference app (load on
        start ``monkey_app.cpp:74``, save on exit ``:67-72``)."""
        import io

        from monkey_moore_tpu.repl import Repl

        path = tmp_path / "cfg" / "config.xml"
        r1 = Repl(out=io.StringIO(), prefs_path=path)
        r1.execute("set width 16")
        r1.execute("set endian big")
        r1.execute("set offsets dec")
        r1.execute("set threads 3")
        r1.save_user_prefs()
        assert path.exists()

        r2 = Repl(out=io.StringIO(), prefs_path=path)
        assert r2.width == 2
        assert r2.offsets == "dec"
        assert r2.threads == 3
        from monkey_moore_tpu.config import Endianness
        assert r2.endian is Endianness.BIG

    def test_parse_error(self, tmp_path):
        (tmp_path / "bad.xml").write_text("garbage")
        with pytest.raises(PrefsError):
            Prefs().load(tmp_path / "bad.xml")

    def test_version_mismatch(self, tmp_path):
        (tmp_path / "old.xml").write_text(
            '<monkey-moore-config version="0.9"/>'
        )
        with pytest.raises(PrefsError):
            Prefs().load(tmp_path / "old.xml")


def run_cli(args, cwd=None):
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "monkey_moore_tpu", *args],
        capture_output=True,
        text=True,
        cwd=cwd or str(Path(__file__).resolve().parent.parent),
        env=env,
        timeout=300,
    )


class TestCli:
    @pytest.fixture(scope="class")
    def rom(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("cli")
        data = np.zeros(300, dtype=np.uint8)
        enc = np.array([ord(c) + 5 for c in "the monkey king"], dtype=np.uint8)
        data[100 : 100 + len(enc)] = enc
        p = d / "rom.bin"
        p.write_bytes(data.tobytes())
        return p

    def test_search(self, rom):
        out = run_cli(["search", str(rom), "monkey", "--cpu", "--previews",
                       "--no-progress", "--preview-width", "20"])
        assert out.returncode == 0, out.stderr
        assert "0x68" in out.stdout  # offset 104
        assert "monkey#king" in out.stdout

    def test_search_dec_offsets(self, rom):
        out = run_cli(["search", str(rom), "monkey", "--cpu", "--offsets",
                       "dec", "--no-progress"])
        assert out.returncode == 0
        assert "104" in out.stdout.split()[0]

    def test_invalid_keyword_rejected(self, rom):
        out = run_cli(["search", str(rom), "ab", "--cpu", "--no-progress"])
        assert out.returncode == 2
        assert "3 or more characters" in out.stderr

    def test_value_scan(self, rom):
        out = run_cli(["value-scan", str(rom), "109", "116", "115", "--cpu",
                       "--no-progress"])
        # m=109+5... value scan of raw shifted values: just check it runs
        assert out.returncode == 0

    def test_export_tbl(self, rom, tmp_path):
        out_path = tmp_path / "monkey.tbl"
        out = run_cli(["export-tbl", str(rom), "monkey", "--cpu",
                       "--no-progress", "-o", str(out_path)])
        assert out.returncode == 0, out.stderr
        text = out_path.read_bytes().decode("utf-8")
        assert "66=a\r\n" in text  # 'a'+5 = 0x66
        assert "46=A\r\n" in text

    def test_sequences_list(self):
        out = run_cli(["sequences", "list"])
        assert out.returncode == 0
        assert "Hiragana" in out.stdout and "Katakana" in out.stdout


class TestProfiling:
    def test_engine_collects_stats(self, tmp_path):
        from monkey_moore_tpu.config import SearchConfig
        from monkey_moore_tpu.engine import SearchEngine

        data = np.zeros(1000, dtype=np.uint8)
        enc = np.array([ord(c) + 4 for c in "statistics"], dtype=np.uint8)
        data[500:510] = enc
        p = tmp_path / "s.bin"
        p.write_bytes(data.tobytes())

        engine = SearchEngine(SearchConfig(file_path=p, keyword="statistics"))
        results = engine.run()
        stats = engine.last_stats
        assert len(results) == 1
        assert stats.results == 1
        assert stats.bytes_scanned >= 1000
        # a 1000-byte file rides the host latency path by default
        assert stats.host_routed and stats.device_dispatches == 0
        assert stats.candidates == 1
        assert "host_scan" in stats.stage_seconds
        assert "GB/s" in stats.summary()

        # forcing the device path collects the device-side stats instead
        engine = SearchEngine(SearchConfig(
            file_path=p, keyword="statistics", host_latency_threshold_bytes=0
        ))
        engine.run()
        stats = engine.last_stats
        assert not stats.host_routed
        assert stats.device_dispatches >= 1
        assert "device_scan" in stats.stage_seconds

    def test_cli_stats_flag(self, tmp_path):
        data = np.zeros(400, dtype=np.uint8)
        enc = np.array([ord(c) + 4 for c in "profile"], dtype=np.uint8)
        data[100:107] = enc
        p = tmp_path / "p.bin"
        p.write_bytes(data.tobytes())
        out = run_cli(["search", str(p), "profile", "--cpu", "--no-progress",
                       "--stats"])
        assert out.returncode == 0
        # a 400-byte file rides the host latency path
        assert "host_scan" in out.stderr


class TestI18n:
    def test_default_english(self):
        from monkey_moore_tpu import i18n
        i18n.set_language("en")
        assert i18n._("File not found") == "File not found"

    def test_pt_br(self):
        from monkey_moore_tpu import i18n
        i18n.set_language("pt_BR.UTF-8")
        try:
            assert i18n.current_language().startswith("pt")
            assert i18n._("File not found") == "Arquivo não encontrado"
            # the vendored reference catalog's wording wins over the
            # built-in subset ("A palavra utilizada na busca...")
            assert "palavra" in i18n._(
                "You must input a keyword with 3 or more characters."
            )
        finally:
            i18n.set_language("en")

    def test_vendored_reference_catalog(self):
        """The full shipped pt_BR catalog (vendored from the reference's
        ``assets/i18n/source/messages-pt_br.po``, loaded at
        ``monkey_app.cpp:26-28``) is merged in: every ``Warning_`` string
        translates, and strings only present in the full catalog (not the
        built-in subset) resolve too."""
        from monkey_moore_tpu import i18n
        from monkey_moore_tpu.validate import Warning_

        cat = i18n.CATALOGS["pt_br"]
        assert len(cat) > 100  # full catalog, not just the built-in subset
        for w in Warning_:
            assert w.value in cat, w.name
            assert cat[w.value] != w.value
        # GUI-era strings that only the vendored catalog carries
        assert cat.get("Search") == "Busca"
        # entries agree with the reference file itself when it is present
        ref_po = Path("/root/reference/assets/i18n/source/messages-pt_br.po")
        if ref_po.exists():
            ref = i18n.load_po(ref_po)
            for k, v in ref.items():
                assert cat.get(k) == v

    def test_po_reader(self, tmp_path):
        from monkey_moore_tpu.i18n import load_po
        po = tmp_path / "t.po"
        po.write_text(
            'msgid "Hello"\nmsgstr "Olá"\n\n'
            'msgid "Multi"\n"line"\nmsgstr "Multi"\n"linha"\n',
            encoding="utf-8",
        )
        catalog = load_po(po)
        assert catalog == {"Hello": "Olá", "Multiline": "Multilinha"}

    def test_cli_translated_warning(self, tmp_path):
        import os
        p = tmp_path / "x.bin"
        p.write_bytes(b"\x00" * 64)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["MMTPU_LANG"] = "pt_BR"
        out = subprocess.run(
            [sys.executable, "-m", "monkey_moore_tpu", "search", str(p), "ab",
             "--cpu", "--no-progress"],
            capture_output=True, text=True, env=env,
            cwd=str(Path(__file__).resolve().parent.parent), timeout=120,
        )
        assert out.returncode == 2
        assert "palavra" in out.stderr


class TestCliMultiSearch:
    def test_multi_search(self, tmp_path):
        data = np.zeros(5000, dtype=np.uint8)
        for w, pos in (("alpha", 100), ("gamma", 3000)):
            data[pos:pos+5] = np.array([ord(c)+3 for c in w], dtype=np.uint8)
        p = tmp_path / "ms.bin"
        p.write_bytes(data.tobytes())
        out = run_cli(["multi-search", str(p), "alpha", "beta", "gamma",
                       "--cpu", "--no-progress"])
        assert out.returncode == 0, out.stderr
        assert "# alpha" in out.stdout and "0x64" in out.stdout
        assert "# gamma" in out.stdout and "0xBB8" in out.stdout

    def test_multi_search_invalid_keyword(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"\x00" * 64)
        out = run_cli(["multi-search", str(p), "alpha", "xy", "--cpu",
                       "--no-progress"])
        assert out.returncode == 2
        assert "'xy'" in out.stderr
