#!/bin/bash
# Fetch the reference's real evaluation volumes, with integrity checks.
#
# Mirrors the three reference harness tiers' downloads:
#   small_vol.mrc  -- Google Drive 1jYL6FEMeWGXO0KYlCb9udrICc2qaZLHB
#                     (/root/reference/src/test_me.sh:1-8)
#   big_vol.mrc    -- Google Drive 1lSFb4VZ5iqR3kLdPv1dDbdOe9dKPZ--_
#                     (/root/reference/src/stress_me.sh:1-6)
#   TS_026.mrc     -- EMPIAR-10988 tomogram TS_026.rec via EBI FTP
#                     (/root/reference/src/pamper_me.sh:1-5)
#
# Integrity: each download is validated as MRC2014 (header parse + data size)
# and its sha256 recorded in data/CHECKSUMS.sha256 on first successful
# download (trust-on-first-use); later runs verify against the recorded
# digest.  Offline (zero-egress sandboxes): prints a notice and exits 0 so
# the synthetic-tier harnesses can proceed.
#
# Usage: scripts/fetch_real_data.sh [data_dir]   (default: ./data)
set -u
cd "$(dirname "$0")/.."
DATA_DIR="${1:-data}"
mkdir -p "$DATA_DIR"
SUMS="$DATA_DIR/CHECKSUMS.sha256"
touch "$SUMS"

have_net() {
    # cheap connectivity probe; EBI is one of the actual sources
    wget -q --spider --timeout=8 https://ftp.ebi.ac.uk/ 2>/dev/null && return 0
    wget -q --spider --timeout=8 https://docs.google.com/ 2>/dev/null && return 0
    return 1
}

validate_mrc() {  # validate_mrc <path>
    python - "$1" <<'PYEOF'
import sys
from flowdenoising_tpu.io.mrc import _HEADER_BYTES, _parse_header
path = sys.argv[1]
with open(path, "rb") as f:
    hdr = _parse_header(f.read(_HEADER_BYTES))
nz, ny, nx = hdr.shape
assert nz > 0 and ny > 0 and nx > 0, f"bad dims {hdr.shape}"
print(f"  valid MRC: shape={hdr.shape} mode={hdr.mode}")
PYEOF
}

check_or_record() {  # check_or_record <path>
    local path="$1" name digest
    name=$(basename "$path")
    digest=$(sha256sum "$path" | cut -d' ' -f1)
    if grep -q " $name\$" "$SUMS" 2>/dev/null; then
        local want
        want=$(grep " $name\$" "$SUMS" | cut -d' ' -f1)
        if [ "$want" != "$digest" ]; then
            echo "  CHECKSUM MISMATCH for $name:"
            echo "    recorded $want"
            echo "    actual   $digest"
            return 1
        fi
        echo "  sha256 verified: $digest"
    else
        echo "$digest  $name" >> "$SUMS"
        echo "  sha256 recorded (first download): $digest"
    fi
}

fetch_gdrive() {  # fetch_gdrive <fileid> <out>
    local FILEID="$1" OUT="$2"
    wget --load-cookies /tmp/fdtpu_cookies.txt \
        "https://docs.google.com/uc?export=download&confirm=$(wget --quiet \
        --save-cookies /tmp/fdtpu_cookies.txt --keep-session-cookies \
        --no-check-certificate \
        'https://docs.google.com/uc?export=download&id='$FILEID -O- \
        | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1\n/p')&id=$FILEID" \
        -O "$OUT" && rm -f /tmp/fdtpu_cookies.txt
}

fetch_one() {  # fetch_one <name> <kind> <src>
    local name="$1" kind="$2" src="$3" path
    path="$DATA_DIR/$name"
    if [ -s "$path" ]; then
        echo "$name: present"
    else
        echo "$name: downloading ($src)"
        case "$kind" in
            gdrive) fetch_gdrive "$src" "$path" ;;
            url)    wget "$src" -O "$path" ;;
        esac
        if [ ! -s "$path" ]; then
            echo "  download failed; removing partial file"
            rm -f "$path"
            return 1
        fi
    fi
    validate_mrc "$path" && check_or_record "$path"
}

if ! have_net; then
    echo "fetch_real_data: no network egress detected; real volumes skipped."
    echo "The synthetic tiers (scripts/test_me.sh etc.) run without them."
    exit 0
fi

rc=0
fetch_one small_vol.mrc gdrive 1jYL6FEMeWGXO0KYlCb9udrICc2qaZLHB || rc=1
fetch_one big_vol.mrc gdrive 1lSFb4VZ5iqR3kLdPv1dDbdOe9dKPZ--_ || rc=1
fetch_one TS_026.mrc url \
    https://ftp.ebi.ac.uk/empiar/world_availability/10988/data/DEF/tomograms/TS_026.rec || rc=1
exit $rc
