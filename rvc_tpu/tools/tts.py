"""TTS frontend: edge-tts synthesis piped into voice conversion.

Capability parity with `rvc*/lib/tools/tts.py` (+ the 800+ voice catalog
`tts_voices.json`): synthesize with Microsoft Edge neural voices, then
convert. Voice listing queries edge-tts live when installed; a built-in
fallback covers the common voices for offline validation.
"""

from __future__ import annotations

import asyncio
from typing import List, Optional

FALLBACK_VOICES = [
    "en-US-AriaNeural", "en-US-GuyNeural", "en-US-JennyNeural",
    "en-GB-LibbyNeural", "en-GB-RyanNeural", "en-AU-NatashaNeural",
    "es-ES-ElviraNeural", "es-MX-DaliaNeural", "fr-FR-DeniseNeural",
    "de-DE-KatjaNeural", "it-IT-ElsaNeural", "pt-BR-FranciscaNeural",
    "ja-JP-NanamiNeural", "ko-KR-SunHiNeural", "zh-CN-XiaoxiaoNeural",
    "ru-RU-SvetlanaNeural", "hi-IN-SwaraNeural", "ar-SA-ZariyahNeural",
]


def list_voices() -> List[str]:
    try:
        import edge_tts

        async def q():
            return await edge_tts.list_voices()

        voices = asyncio.run(q())
        return sorted(v["ShortName"] for v in voices)
    except Exception:
        return list(FALLBACK_VOICES)


def synthesize(text: str, voice: str = "en-US-AriaNeural",
               rate: int = 0, output_path: str = "tts_output.wav") -> str:
    """Text -> wav via edge-tts (network required)."""
    import edge_tts

    async def run():
        tts = edge_tts.Communicate(text, voice, rate=f"{rate:+d}%")
        await tts.save(output_path)

    asyncio.run(run())
    return output_path


def tts_and_convert(rvc, text: str, voice: str, output_path: str,
                    rate: int = 0, tts_wav: str = "tts_output.wav",
                    **infer_kwargs) -> str:
    synthesize(text, voice, rate, tts_wav)
    return rvc.infer_file(tts_wav, output_path, **infer_kwargs)
