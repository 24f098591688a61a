"""Pin the extracted candidate tables (extract.py) to their ISO 13818-7
identities and emit one consolidated learned/aac_tables.json.

Assignment evidence (all three agree; behavioral decode is the final
arbiter in tests/test_aac_conformance.py):
  1. memory layout — lavc stores the spectral books consecutively in
     DESCENDING book order (11 .. 1, then the scalefactor book), and the
     swb_offset tables in ascending sample-rate order;
  2. alphabet sizes — 289/169/169/64/64/81x6 match books 11/10/9/8/7/6-1;
  3. known grammar structure — odd ("peaky") books have a 1-bit code on
     the all-zero symbol, even ("flat") books do not; the scalefactor
     book's 1-bit code sits at dpcm index 60 (delta 0).
"""

from __future__ import annotations

import json
from pathlib import Path

HERE = Path(__file__).parent
L = HERE / "learned"

# offset -> identity pins, from the structural analysis above
SPECTRAL_BITS_OFF = {
    11: 11319296, 10: 11320224, 9: 11320768, 8: 11321312, 7: 11321504,
    6: 11321696, 5: 11321984, 4: 11322272, 3: 11322560, 2: 11322848,
    1: 11323136,
}
SCALEFACTOR_BITS_OFF = 11323424
SWB_LONG_16_OFF = 11308960   # 43 bands, first width 8
SWB_SHORT_16_OFF = 11308928  # 15 bands
SWB_LONG_8_OFF = 11308832    # 40 bands, first width 12
SWB_SHORT_8_OFF = 11308800   # 15 bands


def main():
    sf = json.load(open(L / "scalefactor_candidates.json"))
    spec = json.load(open(L / "spectral_candidates.json"))
    swb = json.load(open(L / "swb_candidates.json"))

    out = {"spectral": {}, "scalefactor": None, "swb": {}}

    for book, off in SPECTRAL_BITS_OFF.items():
        hits = [h for hs in spec.values() for h in hs if h["bits_off"] == off]
        assert hits, f"book {book}: no candidate at offset {off}"
        h = hits[0]
        out["spectral"][str(book)] = {"bits": h["bits"], "codes": h["codes"]}

    hit = [h for h in sf if h["bits_off"] == SCALEFACTOR_BITS_OFF]
    assert hit and hit[0]["bits"][60] == 1
    out["scalefactor"] = {"bits": hit[0]["bits"], "codes": hit[0]["codes"]}

    for key, off, kind in [("long_16", SWB_LONG_16_OFF, "long"),
                           ("short_16", SWB_SHORT_16_OFF, "short"),
                           ("long_8", SWB_LONG_8_OFF, "long"),
                           ("short_8", SWB_SHORT_8_OFF, "short")]:
        hits = [h for h in swb[kind] if h["off"] == off]
        assert hits, f"swb {key}: no candidate at offset {off}"
        out["swb"][key] = hits[0]["offsets"]
    assert len(out["swb"]["long_16"]) == 44   # 43 bands
    assert len(out["swb"]["short_16"]) == 16  # 15 bands

    (L / "aac_tables.json").write_text(json.dumps(out))
    print("wrote", L / "aac_tables.json")


if __name__ == "__main__":
    main()
