"""tokenize_text CLI (the recipe token-list stage, mlm.sh:257-260)."""

import pytest

from a3t_tpu.bin.tokenize_text import field_slice, main, tokenize_line


def test_field_slice_semantics():
    cols = ["uid", "AA", "IY", "UW"]
    assert cols[field_slice("2-")] == ["AA", "IY", "UW"]
    assert cols[field_slice("2-3")] == ["AA", "IY"]
    assert cols[field_slice("-2")] == ["uid", "AA"]
    assert cols[field_slice("3")] == ["IY"]
    with pytest.raises(ValueError):
        field_slice("0-")


def test_tokenize_modes():
    assert tokenize_line("AA IY", "word", "<space>") == ["AA", "IY"]
    assert tokenize_line("ab c", "char", "<space>") == \
        ["a", "b", "<space>", "c"]


def test_vocabulary_mode_matches_recipe_layout(tmp_path):
    src = tmp_path / "text"
    src.write_text(
        "utt1 AA IY IY\n"
        "utt2 IY UW\n"
        "utt3 AA IY\n"
    )
    out = tmp_path / "tokens.txt"
    main(["-i", str(src), "-o", str(out), "--field", "2-",
          "--write-vocabulary",
          "--add-symbol", "<blank>:0", "--add-symbol", "<unk>:1",
          "--add-symbol", "<sos/eos>:-1"])
    tokens = out.read_text().splitlines()
    # blank/unk pinned first, sos/eos pinned last (mlm.sh token list)
    assert tokens[0] == "<blank>" and tokens[1] == "<unk>"
    assert tokens[-1] == "<sos/eos>"
    # counts order: IY (4) > AA (2) > UW (1)
    assert tokens[2:-1] == ["IY", "AA", "UW"]


def test_cutoff_and_size_cap(tmp_path):
    src = tmp_path / "text"
    src.write_text("u1 A A A B B C\n")
    out = tmp_path / "v.txt"
    main(["-i", str(src), "-o", str(out), "--field", "2-",
          "--write-vocabulary", "--cutoff", "1", "--write-counts"])
    assert out.read_text().splitlines() == ["A 3", "B 2"]
    main(["-i", str(src), "-o", str(out), "--field", "2-",
          "--write-vocabulary", "--vocabulary-size", "1"])
    assert out.read_text().splitlines() == ["A"]


def test_tokenize_passthrough(tmp_path):
    src = tmp_path / "text"
    src.write_text("u1 AA IY\nu2 UW\n")
    out = tmp_path / "t.txt"
    main(["-i", str(src), "-o", str(out), "--field", "2-"])
    assert out.read_text().splitlines() == ["AA IY", "UW"]


def test_multiple_negative_positions(tmp_path):
    """Regression: several negative --add-symbol positions must all land
    at their final-index slots."""
    src = tmp_path / "text"
    src.write_text("u1 X X Y\n")
    out = tmp_path / "v.txt"
    main(["-i", str(src), "-o", str(out), "--field", "2-",
          "--write-vocabulary",
          "--add-symbol", "<a>:-2", "--add-symbol", "<b>:-1"])
    assert out.read_text().splitlines() == ["X", "Y", "<a>", "<b>"]


def test_position_clash_rejected(tmp_path):
    import pytest

    src = tmp_path / "text"
    src.write_text("u1 X\n")
    with pytest.raises(ValueError):
        # total length 3 -> position -3 resolves to 0, clashing with <a>:0
        main(["-i", str(src), "-o", str(tmp_path / "v"), "--field", "2-",
              "--write-vocabulary",
              "--add-symbol", "<a>:0", "--add-symbol", "<b>:-3"])
