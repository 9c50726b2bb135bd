"""Full-chain scalar port of `TxProcessor_Run` — the TX conformance
oracle (float64 NumPy, the reference's EXACT imported tables).

Models the voice TX paths (`drivers/audio/tx_processor.c:891-1078`) at
default settings, stage for stage:

  SSB/AM: PrepareVoice (:440) = input gain -> TX IIR-lattice voice
    bandpass (IIR_TX_SOPRANO by default, IIR_TX_2k7_FM for FM; selection
    `tx_processor.c:88-107`) -> [bass/treble biquads neutral] ->
    VoiceCompressor (:173) = post-filter gain (alc_params[tx_comp_level=2]
    -> gain 4/2+0.5) + KA7OEI look-ahead ALC (knee 30000, attack 0.1,
    decay 10^-((10+35)/10)) with the AUDIO_DELAY_BUFSIZE ring delay
  SSB (:467): 201-tap TX Hilbert pair (iq_tx_wide; I/Q swapped for LSB)
    -> FreqShift -> SSB_GAIN_COMP
  AM (:734): Hilbert pair -> i=(I-Q)+2*AM_CARRIER_LEVEL,
    q=(Q-I)-2*AM_CARRIER_LEVEL -> FreqShift -> AM_GAIN_COMP
  FM (:534): 6 dB/oct pre-emphasis differentiator (alpha 0.05) ->
    integer phase-accumulator frequency modulation through the 10-bit
    DDS sine table (FM_MOD_SCALING 16, x2 for 5 kHz deviation;
    FM_MOD_AMPLITUDE_SCALING 0.875) at +translate
"""
from __future__ import annotations

import numpy as np
from scipy import signal

from uhsdr_tpu import data
from uhsdr_tpu.ops.lattice import iir_lattice_ref

IQ_RATE = 48000.0

# audio_driver.h:403-429, tx_processor.c:493-511
ALC_VAL_MAX = 1.0
ALC_VAL_MIN = 0.001
ALC_ATTACK = 0.1
ALC_KNEE = 30000.0
AM_CARRIER_LEVEL = 5100.0
SSB_GAIN_COMP = 1.133
AM_GAIN_COMP = 1.133
FM_MOD_SCALING = 16.0
FM_MOD_AMPLITUDE_SCALING = 0.875
FM_TX_HPF_ALPHA = 0.05
FM_MOD_ACC_MAX = 1 << 16
# default compression level 2 (ref_config.json EEPROM_TX_AUDIO_COMPRESS)
# -> alc_params[2] = {tx_postfilt_gain 4, alc_decay 10}
# (audio_management.c:248-262)
ALC_POSTFILT_GAIN = 4.0
ALC_DECAY_VAR = 10.0
# AUDIO_DELAY_BUFSIZE = IQ_BUFSZ*5 = 2*32*5 (audio_driver.h:516); the
# firmware's blockSize is 32
AUDIO_DELAY_BUFSIZE = 2 * 32 * 5
FW_BLOCK = 32


def voice_compressor(a: np.ndarray, gain_scaling: float = 1.0,
                     dtype=np.float64) -> np.ndarray:
    """TxProcessor_VoiceCompressor (tx_processor.c:173-245)."""
    gain_calc = ALC_POSTFILT_GAIN / 2.0 + 0.5
    alc_decay = 10.0 ** (-((ALC_DECAY_VAR + 35.0) / 10.0))
    a = np.asarray(a, dtype) * dtype(gain_calc)

    alc_val = 1.0       # ads.alc_val init (AudioDriver_Init)
    agc_val = np.empty_like(a)
    for i, x in enumerate(a):
        alc_var = abs(x * alc_val) / ALC_KNEE - 1.0
        if alc_var < 0:
            alc_val -= alc_val * alc_decay * alc_var
        else:
            alc_val -= alc_val * ALC_ATTACK * alc_var
            alc_val = max(alc_val, ALC_VAL_MIN)
        alc_val = min(alc_val, ALC_VAL_MAX)
        agc_val[i] = alc_val * gain_scaling

    # block-ring ALC delay (in/out pointer walk, blockSize=32):
    # outbuf = inbuf + blockSize (mod BUFSIZE) -> the audio is delayed by
    # BUFSIZE - 2*blockSize... replicate the pointer arithmetic literally
    delay = np.zeros(AUDIO_DELAY_BUFSIZE, dtype)
    # zeros, not empty: for lengths not a multiple of FW_BLOCK the block
    # loop leaves a tail unwritten and it must be deterministic (silence),
    # not uninitialized memory.
    out = np.zeros_like(a)
    inptr = 0
    nblk = len(a) // FW_BLOCK
    for b in range(nblk):
        inptr = (inptr + FW_BLOCK) % AUDIO_DELAY_BUFSIZE
        outptr = (inptr + FW_BLOCK) % AUDIO_DELAY_BUFSIZE
        seg = a[b * FW_BLOCK:(b + 1) * FW_BLOCK]
        delay[inptr:inptr + FW_BLOCK] = seg
        out[b * FW_BLOCK:(b + 1) * FW_BLOCK] = \
            delay[outptr:outptr + FW_BLOCK]
    return out * agc_val[: len(out)]


def prepare_voice(audio: np.ndarray, mode: str) -> np.ndarray:
    """TxProcessor_PrepareVoice (:440): voice bandpass lattice +
    compressor.  gain_scaling: SSB 1.0, AM 0.23 (audio_driver.h:417,428).
    Input `audio` is in the firmware's int16-count float domain.

    The FM path runs in float32: its phase accumulator floors the audio
    every sample, so f64-vs-f32 arithmetic differences would flip floor
    decisions and integrate into a phase random walk that caps the
    conformance comparison — matching the firmware's own float width
    removes that artifact."""
    dtype = np.float32 if mode == "fm" else np.float64
    lat = "IIR_TX_2k7_FM" if mode == "fm" else "IIR_TX_SOPRANO"
    pk, pv = data.lattice(lat)
    a, _ = iir_lattice_ref(pk, pv, np.asarray(audio, dtype), dtype=dtype)
    gain = 0.23 if mode == "am" else 1.0
    return voice_compressor(a, gain, dtype=dtype)


def _hilbert_pair(a: np.ndarray):
    h_i = data.fir("iq_tx_wide_i")
    h_q = data.fir("iq_tx_wide_q")
    i_b = signal.lfilter(h_i, [1.0], a)
    q_b = signal.lfilter(h_q, [1.0], a)
    return i_b, q_b


def freq_shift(i_b, q_b, translate_hz: float, fs: float = IQ_RATE):
    z = (i_b + 1j * q_b) * np.exp(
        2j * np.pi * translate_hz * np.arange(len(i_b)) / fs)
    return z.real, z.imag


def ref_tx_chain(audio: np.ndarray, mode: str,
                 translate_hz: float = 6000.0,
                 fm_dev5: bool = False) -> np.ndarray:
    """audio (T,) @48k (int16-count domain) -> IQ (T,) complex.

    Default settings: compression level 2, flat bass/treble, no tune,
    LINE/MIC gains folded into the caller's input scaling."""
    audio = np.asarray(audio, np.float64)

    if mode in ("usb", "lsb"):
        a = prepare_voice(audio, mode)
        i_b, q_b = _hilbert_pair(a)
        if mode == "lsb":       # filters swapped (tx_processor.c:478-480)
            i_b, q_b = q_b, i_b
        # QSE wiring: the firmware's h_q LEADS h_i, so in its i+jq buffer
        # USB content sits BELOW the translate; the mcHF TX mixer wiring
        # mirrors the BASEBAND spectrum between DAC and antenna, which in
        # the RX capture convention (this framework's contract, and what
        # the firmware's own RX demodulates) is a conjugation BEFORE the
        # translate shift.  See mod.modulators.ssb_params_ref.
        q_b = -q_b
        i_b, q_b = freq_shift(i_b, q_b, translate_hz)
        return (i_b + 1j * q_b) * SSB_GAIN_COMP

    if mode == "am":
        a = prepare_voice(audio, mode)
        i_b, q_b = _hilbert_pair(a)
        i_am = (i_b - q_b) + 2 * AM_CARRIER_LEVEL
        q_am = (q_b - i_b) - 2 * AM_CARRIER_LEVEL
        i_b, q_b = freq_shift(i_am, q_am, translate_hz)
        return (i_b + 1j * q_b) * AM_GAIN_COMP

    if mode == "fm":
        a = prepare_voice(audio, mode)
        # 6 dB/oct pre-emphasis differentiator (tx_processor.c:543-552)
        f32 = np.float32
        hpf_a = hpf_b = f32(0.0)
        d = np.empty_like(a, dtype=np.float32)
        for i, x in enumerate(np.asarray(a, np.float32)):
            hpf_b = f32(f32(FM_TX_HPF_ALPHA) * f32(hpf_b + x - hpf_a))
            hpf_a = x
            d[i] = hpf_b
        # integer phase-accumulator DDS modulation (:568-588)
        dds = data.array("dds_table")           # int16 sine, 1024 points
        mult = 2.0 if fm_dev5 else 1.0
        word = (FM_MOD_ACC_MAX * abs(int(translate_hz))) // int(IQ_RATE)
        acc = 0
        i_b = np.empty_like(a)
        q_b = np.empty_like(a)
        for i, x in enumerate(d):
            acc = int(np.float32(acc)
                      + np.float32(word + np.float32(x)
                                   * np.float32(FM_MOD_SCALING * mult))
                      ) % FM_MOD_ACC_MAX
            idx = acc >> 6                      # 16-bit acc -> 10-bit table
            i_b[i] = dds[idx]
            q_b[i] = dds[(idx + 3 * 1024 // 4) % 1024]
        if translate_hz < 0:
            i_b, q_b = q_b, i_b
        return (i_b + 1j * q_b) * FM_MOD_AMPLITUDE_SCALING

    raise ValueError(mode)


# ---------------------------------------------------------------------------
# Digital-mode TX oracles (VERDICT r3 item 7): scalar ports of
# TxProcessor_CW / TxProcessor_Rtty / TxProcessor_Psk
# (tx_processor.c:811-889) and the generators they drive.
# ---------------------------------------------------------------------------

DDS_TBL_SIZE = 1024
_ACC_SHIFT = 32 - 10                       # SOFTDDS_ACC_SHIFT


class SoftDds:
    """softdds.c phase-accumulator synth: uint32 accumulator, 10-bit
    int16 sine table (the imported DDS_TABLE), truncating index."""

    def __init__(self, freq: float, samp_rate: int):
        self.table = np.asarray(data.array("dds_table"), np.int64)
        # softdds_stepForSampleRate: (uint64)(freq*1024) << 22 / rate
        self.step = (int(freq * DDS_TBL_SIZE) << _ACC_SHIFT) // int(samp_rate)
        self.acc = 0

    def next_index(self) -> int:
        k = (self.acc >> _ACC_SHIFT) % DDS_TBL_SIZE
        self.acc = (self.acc + self.step) & 0xFFFFFFFF
        return k

    def next_sample(self) -> int:
        return int(self.table[self.next_index()])

    def run_iq(self, n: int):
        """softdds_genIQSingleTone: i=sin, q=cos (index + 3N/4)."""
        i_b = np.empty(n)
        q_b = np.empty(n)
        for s in range(n):
            k = self.next_index()
            i_b[s] = self.table[k]
            q_b[s] = self.table[(k + 3 * DDS_TBL_SIZE // 4) % DDS_TBL_SIZE]
        return i_b, q_b


def _filter_audio_bandpass(a: np.ndarray) -> np.ndarray:
    """TxProcessor_FilterAudio(do_bandpass=True, do_bass_treble=False):
    the 2k7 TX IIR lattice only (tx_processor.c:416-429; digital modes
    never run the voice biquads)."""
    pk, pv = data.lattice("IIR_TX_SOPRANO")
    y, _ = iir_lattice_ref(pk, pv, np.asarray(a, np.float64))
    return y


def _ssb_tx_no_shift(a: np.ndarray, lsb: bool) -> np.ndarray:
    """TxProcessor_SSB with translate 0 (the digital-mode call,
    tx_processor.c:818/841) + IqFinalProcessing gain comp."""
    i_b, q_b = _hilbert_pair(a)
    if lsb:
        i_b, q_b = q_b, i_b
    q_b = -q_b                 # QSE wiring (see ref_tx_chain)
    return (i_b + 1j * q_b) * SSB_GAIN_COMP


# --- RTTY (rtty.c Rtty_Modulator_*, 45.45 Bd / 170 Hz default) ---

RTTY_LETTER_CODE = 0b11111
RTTY_SYMBOL_CODE = 0b11011
RTTY_CODE_MODE_MASK = 0b100000
RTTY_MODE_LETTERS = 0
RTTY_MODE_SYMBOLS = 1


class RttyTxOracle:
    """Rtty_Modulator_GenSample port: Baudot framing (1 start + 5 data +
    2 stop bits at 1.5-stopbit config = 8 bit slots), 1056 samples/bit
    @48k (oneBitSampleCount=round(12000/45.45)*4), two per-tone softdds
    NCOs (mark 915 / space 1085 Hz), only the ACTIVE tone's accumulator
    advancing (non-MSK mode)."""

    def __init__(self, text: str, samp_rate: int = 48000,
                 baud: float = 45.45, shift: float = 170.0):
        self.tables = data.digimode_tables()
        self.dds = [SoftDds(915.0 + shift, samp_rate),   # [0] = space
                    SoftDds(915.0, samp_rate)]           # [1] = mark
        self.one_bit = int(round(round(12000.0 / baud) * samp_rate / 12000.0))
        self.queue = [ord(c) & 0x7F for c in text]
        # Rtty_Modulator_StartTX
        self.char_bits = 0
        self.char_bit_idx = 0
        self.char_bit_samples = 0
        self.char_mode = RTTY_MODE_LETTERS
        self.current_bit = 1
        self._code2bits(RTTY_LETTER_CODE)

    def _baudot_add(self, bits: int):
        bits = (bits << 1) | 0b11000000       # start=0 LSB, 2 stop bits
        self.char_bits |= bits << self.char_bit_idx
        self.char_bit_idx += 8

    def _code2bits(self, baudot_info: int):
        self.char_bits = 0
        self.char_bit_idx = 0
        if (baudot_info & RTTY_CODE_MODE_MASK) == RTTY_CODE_MODE_MASK:
            if self.char_mode != RTTY_MODE_LETTERS:
                self.char_mode = RTTY_MODE_LETTERS
                self._baudot_add(RTTY_LETTER_CODE)
        else:
            if self.char_mode != RTTY_MODE_SYMBOLS:
                self.char_mode = RTTY_MODE_SYMBOLS
                self._baudot_add(RTTY_SYMBOL_CODE)
        self._baudot_add(baudot_info & ~RTTY_CODE_MODE_MASK)

    def gen_sample(self) -> int:
        if self.char_bit_samples == 0:
            self.char_bit_samples = self.one_bit
            self.char_bits >>= 1
            if self.char_bit_idx == 0:
                filled = False
                while not filled and self.queue:
                    cur = self.tables["ascii2baudot"][self.queue.pop(0)]
                    if cur > 0:
                        self._code2bits(int(cur))
                        filled = True
                if not filled:      # IDLE
                    self._code2bits(RTTY_LETTER_CODE | RTTY_CODE_MODE_MASK)
            self.char_bit_idx -= 1
            self.current_bit = self.char_bits & 1
        self.char_bit_samples -= 1
        return self.dds[self.current_bit].next_sample()

    def gen(self, n: int) -> np.ndarray:
        return np.array([self.gen_sample() for _ in range(n)], np.float64)


def rtty_tx_oracle(text: str, n: int) -> np.ndarray:
    """TxProcessor_Rtty (:811): generator -> 2k7 bandpass -> SSB(USB,
    no shift) -> gain comp.  Returns IQ (n,) complex."""
    o = RttyTxOracle(text)
    a = o.gen(n)
    return _ssb_tx_no_shift(_filter_audio_bandpass(a), lsb=False)


# --- PSK (psk.c Psk_Modulator_*, BPSK31 default) ---

PSK_SAMPLE_MAX = 32766
PSK_OFFSET = 500.0

PSK_MOD_OFF, PSK_MOD_ACTIVE, PSK_MOD_PREAMBLE, PSK_MOD_POSTAMBLE, \
    PSK_MOD_INACTIVE = range(5)


class PskTxOracle:
    """Psk_Modulator_GenSample port (31.25 Bd): preamble of ~1 s
    phase-reversal zeros, reversed-varicode characters with 2 spacing
    zeros, postamble ones, cosine-half envelope shaping on every
    reversal via the bit-rate/2 softdds."""

    def __init__(self, text: str, samp_rate: int = 48000,
                 speed: float = 31.25):
        self.tables = data.digimode_tables()
        self.dds = SoftDds(PSK_OFFSET, samp_rate)
        self.bit_dds = SoftDds(speed / 2.0, samp_rate)
        self.speed = speed
        self.bit_len = round(samp_rate / speed * 2)
        self.queue = [ord(c) & 0x7F for c in text] + [0x04]   # EOT
        # Psk_Modulator_SetState(PSK_MOD_PREAMBLE)
        self.state = PSK_MOD_PREAMBLE
        self.tx_ones = 0
        self.tx_win = True
        self.tx_bits = 0
        self.sign_next = 1
        self.sign_cur = 1
        self.bit_phase = 0
        self.tx_zeros = 0

    def _find_char_reversed(self, c: int) -> int:
        code = int(self.tables["psk_varicode"][c])
        ret = 0
        while code > 0:
            ret |= code & 1
            ret <<= 1
            code >>= 1
        return ret

    def gen_sample(self) -> float:
        if self.state == PSK_MOD_OFF:
            return 0.0
        if self.bit_phase == self.bit_len // 4:          # bit_start
            if self.tx_bits == 0:
                if self.tx_zeros < 2 or self.state == PSK_MOD_PREAMBLE:
                    self.tx_zeros += 1
                    if self.state == PSK_MOD_PREAMBLE \
                            and self.tx_zeros >= self.speed:
                        self.state = PSK_MOD_ACTIVE
                elif self.queue:
                    ch = self.queue.pop(0)
                    self.state = PSK_MOD_ACTIVE
                    if ch == 0x04:
                        self.state = PSK_MOD_POSTAMBLE
                    else:
                        self.tx_bits = self._find_char_reversed(ch)
                        self.tx_zeros = 0
                        self.tx_ones = 0
                if self.state == PSK_MOD_POSTAMBLE:
                    if self.tx_ones < self.speed:
                        self.tx_ones += 16
                        self.tx_bits = 0xFFFF
                    else:
                        self.state = PSK_MOD_INACTIVE
            if (self.tx_bits & 1) == 0 and self.tx_ones == 0:
                self.sign_next *= -1
            self.tx_win = (self.sign_next != self.sign_cur
                           or self.state == PSK_MOD_INACTIVE)
            self.tx_bits >>= 1
        if self.bit_phase == 0:                          # bit_middle
            self.sign_cur = self.sign_next
            if self.tx_win:
                self.bit_dds.acc = 0                     # Bpsk_ResetWin
            if self.state == PSK_MOD_INACTIVE:
                self.state = PSK_MOD_OFF
        coeff = abs(self.bit_dds.next_sample()) if self.tx_win \
            else PSK_SAMPLE_MAX
        self.bit_phase = (self.bit_phase + 1) % (self.bit_len // 2)
        # C int32 division truncates toward zero
        prod = coeff * self.sign_cur * self.dds.next_sample()
        return float(int(prod / PSK_SAMPLE_MAX))

    def gen(self, n: int) -> np.ndarray:
        return np.array([self.gen_sample() for _ in range(n)], np.float64)


def psk_tx_oracle(text: str, n: int) -> np.ndarray:
    """TxProcessor_Psk (:833): generator -> 2k7 bandpass -> SSB(USB,
    no shift) -> gain comp."""
    o = PskTxOracle(text)
    a = o.gen(n)
    return _ssb_tx_no_shift(_filter_audio_bandpass(a), lsb=False)


# --- CW (cw_gen.c straight-key machine + smoothing table) ---

CW_SMOOTH_LEN = 2
CW_SMOOTH_TBL_SIZE = 128
FW_BLOCK_CW = 32


class CwTxOracle:
    """CwGen_ProcessStraightKey port at block (32-sample) granularity:
    key_timer phases 3 (rising) / 2 (steady) / 1 (falling) / 0 (off),
    sm_table stepped every CW_SMOOTH_LEN samples on edges, softdds IQ
    tone at the sidetone frequency.  `key` is a per-block bool array
    (the PTT/paddle line state, sampled at the 1500 Hz block rate)."""

    def __init__(self, sidetone_hz: float = 700.0, samp_rate: int = 48000):
        self.dds = SoftDds(sidetone_hz, samp_rate)
        self.sm = np.asarray(data.digimode_tables()["cw_sm_table"])
        self.key_timer = 0
        self.sm_ptr = 0

    def _shape_rising(self, g):
        """CwGen_RemoveClickOnRisingEdge applied to a gain vector (the
        same factor multiplies I and Q)."""
        if self.sm_ptr < CW_SMOOTH_TBL_SIZE:
            j = 0
            for s in range(len(g)):
                g[s] *= self.sm[self.sm_ptr]
                j += 1
                if j == CW_SMOOTH_LEN:
                    j = 0
                    self.sm_ptr += 1
                    if self.sm_ptr > CW_SMOOTH_TBL_SIZE - 1:
                        break

    def _shape_falling(self, g):
        if self.sm_ptr > CW_SMOOTH_TBL_SIZE - 1:
            self.sm_ptr = CW_SMOOTH_TBL_SIZE - 1
        j = 0
        for s in range(len(g)):
            g[s] *= self.sm[self.sm_ptr]
            j += 1
            if j == CW_SMOOTH_LEN:
                j = 0
                if self.sm_ptr > 0:
                    self.sm_ptr -= 1

    def process(self, key_blocks: np.ndarray):
        """key_blocks: (n_blocks,) bool.  Returns (iq, gain): IQ
        (n_blocks*32,) complex (i + jq, USB wiring) and the per-sample
        applied keying gain (sm_table envelope; 0 in silence)."""
        n = len(key_blocks) * FW_BLOCK_CW
        out = np.zeros(n, complex)
        gain = np.zeros(n)
        for b, pressed in enumerate(key_blocks):
            if pressed and self.key_timer == 0:
                self.sm_ptr = 0
                self.key_timer = 3
            if self.key_timer == 0:
                continue
            i_b, q_b = self.dds.run_iq(FW_BLOCK_CW)
            g = np.ones(FW_BLOCK_CW)
            if self.key_timer > 2:
                self._shape_rising(g)
                if self.sm_ptr >= CW_SMOOTH_TBL_SIZE:
                    self.key_timer = 2
            if self.key_timer < 2:
                self._shape_falling(g)
                if self.sm_ptr == 0:
                    self.key_timer = 0
            if self.key_timer == 2 and not pressed:
                self.key_timer = 1
            out[b * FW_BLOCK_CW:(b + 1) * FW_BLOCK_CW] = (i_b + 1j * q_b) * g
            gain[b * FW_BLOCK_CW:(b + 1) * FW_BLOCK_CW] = g
        return out, gain


# --- CW text keyer (CwGen_ProcessIambic + CwGen_CheckDigiBufferState:
#     the firmware's text-entry TX path) ---

CW_SMOOTH_STEPS = 9
_CW_MORSE = {   # cw_char_codes (cw_gen.c:106-154): base-4, 2=dit 3=dah
    " ": 1, "E": 2, "T": 3, "I": 10, "A": 11, "N": 14, "M": 15,
    "S": 42, "U": 43, "R": 46, "W": 47, "D": 58, "K": 59, "G": 62,
    "O": 63, "H": 170, "V": 171, "F": 174, "L": 186, "P": 190, "J": 191,
    "B": 234, "X": 235, "C": 238, "Y": 239, "Z": 250, "Q": 251,
    "5": 682, "4": 683, "3": 687, "2": 703, "1": 767, "6": 938,
    "=": 939, "/": 942, "7": 1002, "8": 1018, "9": 1022, "0": 1023,
    "?": 2810, ".": 3003, "@": 3054, "-": 3755, ",": 4015, ":": 4074,
}


def _cw_reverse_code(code: int) -> int:
    result = 0
    while code > 0:
        result = result * 4 + code % 4
        code //= 4
    return result


class CwTextTxOracle:
    """CwGen_ProcessIambic port (keyer mode IAM_B, text entry): the
    block-granular element state machine — KEY_DOWN/KEY_UP with
    dit/dah_time from CwGen_SetSpeed (1500 Hz block ticks, weight 100),
    PAUSE between elements, END_PROC + space_timer between characters —
    with the sm_table envelope shaping and softdds IQ tone."""

    IDLE, WAIT, DIT_CHECK, DAH_CHECK, KEY_DOWN, KEY_UP, PAUSE = range(7)
    DIT_L, DAH_L, DIT_PROC, END_PROC = 1, 2, 4, 8

    def __init__(self, text: str, wpm: int = 20,
                 sidetone_hz: float = 700.0, samp_rate: int = 48000):
        self.dds = SoftDds(sidetone_hz, samp_rate)
        self.sm = np.asarray(data.digimode_tables()["cw_sm_table"])
        # CwGen_SetSpeed (cw_gen.c:387-406), weight = 100
        self.dit_time = (180000 // wpm + CW_SMOOTH_STEPS * 100) // 100
        self.dah_time = (3 * 180000 // wpm + CW_SMOOTH_STEPS * 100) // 100
        self.pause_time = (180000 // wpm - CW_SMOOTH_STEPS * 100) // 100
        self.space_time = 6 * (180000 // wpm) // 100
        self.queue = [c for c in text.upper() if c in _CW_MORSE]
        self.state = self.IDLE
        self.port_state = 0
        self.key_timer = 0
        self.space_timer = 0
        self.sending_char = 0
        self.sm_ptr = 0

    # envelope shaping shared with the straight-key oracle
    _shape_rising = CwTxOracle._shape_rising
    _shape_falling = CwTxOracle._shape_falling

    def _check_digi_buffer(self):
        if (not self.sending_char and not (self.port_state & self.END_PROC)
                and self.space_timer < self.space_time - self.dah_time):
            if self.queue:
                c = self.queue.pop(0)
                self.sending_char = _cw_reverse_code(_CW_MORSE[c])
                if self.sending_char == 1:
                    self.space_timer = self.space_time
        if self.sending_char > 1:
            if self.sending_char % 4 == 3:
                self.port_state |= self.DAH_L
            else:
                self.port_state |= self.DIT_L
            self.sending_char //= 4

    def _block(self):
        """One 32-sample block.  Returns (i, q) or None for silence."""
        out = None
        rerun = True
        while rerun:
            rerun = False
            st = self.state
            if st == self.IDLE:
                self._check_digi_buffer()
                if self.port_state & (self.DAH_L | self.DIT_L):
                    self.state = self.WAIT
                    rerun = True
                else:
                    if self.port_state & self.END_PROC:
                        self.port_state &= ~self.END_PROC
                        self.space_timer = self.space_time
                    if self.space_timer > 0:
                        self.space_timer -= 1
                        if self.space_timer == 0 and self.sending_char == 1:
                            self.sending_char = 0
            elif st == self.WAIT:       # text entry -> always proceeds
                self.state = self.DIT_CHECK
                rerun = True
            elif st == self.DIT_CHECK:
                if self.port_state & self.DIT_L:
                    self.port_state |= self.DIT_PROC
                    self.key_timer = self.dit_time
                    self.state = self.KEY_DOWN
                else:
                    self.state = self.DAH_CHECK
                rerun = True
            elif st == self.DAH_CHECK:
                if self.port_state & self.DAH_L:
                    self.key_timer = self.dah_time
                    self.state = self.KEY_DOWN
                else:
                    self.port_state |= self.END_PROC
                    self.state = self.IDLE
                rerun = True
            elif st == self.KEY_DOWN:
                i_b, q_b = self.dds.run_iq(FW_BLOCK_CW)
                g = np.ones(FW_BLOCK_CW)
                self.key_timer -= 1
                self.sm_ptr = 0
                self._shape_rising(g)
                self.port_state &= ~(self.DIT_L | self.DAH_L)
                self.state = self.KEY_UP
                out = (i_b, q_b, g)
            elif st == self.KEY_UP:
                if self.key_timer == 0:
                    self.key_timer = self.pause_time
                    self.state = self.PAUSE
                else:
                    i_b, q_b = self.dds.run_iq(FW_BLOCK_CW)
                    g = np.ones(FW_BLOCK_CW)
                    self.key_timer -= 1
                    if self.key_timer > self.dit_time // 2:
                        self._shape_rising(g)
                    if self.key_timer < CW_SMOOTH_STEPS:
                        self._shape_falling(g)
                    out = (i_b, q_b, g)
            elif st == self.PAUSE:
                self.key_timer -= 1
                if self.key_timer == 0:
                    # IAM_A/B (cw_gen.c:990-1006): after a dit, try the
                    # other paddle; otherwise END_PROC + IDLE — where
                    # CheckDigiBufferState raises the NEXT element's
                    # flag, re-entering the element states via rerun
                    # (this is how text feeding interleaves: every
                    # element passes through IDLE)
                    if self.port_state & self.DIT_PROC:
                        self.port_state &= ~(self.DIT_L | self.DIT_PROC)
                        self.state = self.DAH_CHECK
                    else:
                        self.port_state |= self.END_PROC
                        self.port_state &= ~self.DAH_L
                        self.state = self.IDLE
                    rerun = True
            # silence blocks leave out = None
        return out

    def process_blocks(self, n_blocks: int):
        """Returns (iq, gain): the keyed tone and the per-sample applied
        keying gain (the envelope our TX chain must reproduce)."""
        n = n_blocks * FW_BLOCK_CW
        out = np.zeros(n, complex)
        gain = np.zeros(n)
        for b in range(n_blocks):
            r = self._block()
            if r is not None:
                i_b, q_b, g = r
                out[b * FW_BLOCK_CW:(b + 1) * FW_BLOCK_CW] = \
                    (i_b + 1j * q_b) * g
                gain[b * FW_BLOCK_CW:(b + 1) * FW_BLOCK_CW] = g
        return out, gain
