"""Generate the toy speech corpus for ctc.ini (deterministic).

Each utterance is a sequence of 1-3 pure tones; each tone maps to one
"word" (a=440 Hz, b=880 Hz, c=1760 Hz). Re-run to regenerate
tests/data/audio/*.wav + the list/transcript files.
"""

import os
import wave

import numpy as np

TONES = {"a": 440.0, "b": 880.0, "c": 1760.0}
RATE = 8000
TONE_SEC = 0.12
GAP_SEC = 0.04

HERE = os.path.dirname(os.path.abspath(__file__))
AUDIO_DIR = os.path.join(HERE, "audio")


def write_wav(path, signal):
    pcm = (np.clip(signal, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(RATE)
        f.writeframes(pcm.tobytes())


def tone(freq, seconds, rng):
    t = np.arange(int(RATE * seconds)) / RATE
    sig = 0.6 * np.sin(2 * np.pi * freq * t)
    sig += 0.02 * rng.randn(len(t))
    # fade in/out to avoid clicks
    ramp = min(len(t) // 8, 80)
    sig[:ramp] *= np.linspace(0, 1, ramp)
    sig[-ramp:] *= np.linspace(1, 0, ramp)
    return sig


def utterance(words, rng):
    gap = np.zeros(int(RATE * GAP_SEC))
    parts = [gap]
    for w in words:
        parts.append(tone(TONES[w], TONE_SEC, rng))
        parts.append(gap)
    return np.concatenate(parts)


def main():
    os.makedirs(AUDIO_DIR, exist_ok=True)
    rng = np.random.RandomState(7)
    words = sorted(TONES)
    corpora = {"train": 24, "val": 8}
    for split, count in corpora.items():
        list_lines, transcript_lines = [], []
        for i in range(count):
            n = rng.randint(1, 4)
            seq = [words[rng.randint(len(words))] for _ in range(n)]
            name = f"{split}_{i:02d}.wav"
            write_wav(os.path.join(AUDIO_DIR, name), utterance(seq, rng))
            list_lines.append(f"audio/{name}")
            transcript_lines.append(" ".join(seq))
        with open(os.path.join(HERE, f"audio_{split}.lst"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(list_lines) + "\n")
        with open(os.path.join(HERE, f"audio_{split}.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(transcript_lines) + "\n")
    print(f"Wrote {sum(corpora.values())} wavs to {AUDIO_DIR}")


if __name__ == "__main__":
    main()
