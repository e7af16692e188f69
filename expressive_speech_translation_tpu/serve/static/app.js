// Studio flow state machine (rebuild of Frontend/src/hooks/useTranslation.js:
// blob-URL lifecycle, AbortController, SSE reader; TranslationFlow.js:95-170
// manual parsing of `data:` frames from a ReadableStream).
"use strict";

const LANG_NAMES = {
  eng: "English", fra: "French", deu: "German", spa: "Spanish", ita: "Italian",
  por: "Portuguese", pol: "Polish", tur: "Turkish", rus: "Russian",
  nld: "Dutch", ces: "Czech", arb: "Arabic", cmn: "Chinese", jpn: "Japanese",
  hun: "Hungarian", kor: "Korean", hin: "Hindi", ell: "Greek", ukr: "Ukrainian",
};

const state = { mode: "audio", busy: false, abort: null, blobUrl: null };
const $ = (id) => document.getElementById(id);

// ---- init: populate languages + backends from the API
async function init() {
  try {
    const langs = (await (await fetch("/supported-languages")).json()).languages;
    for (const sel of [$("src"), $("tgt")]) {
      sel.innerHTML = "";
      for (const code of langs) {
        const opt = document.createElement("option");
        opt.value = code;
        opt.textContent = `${LANG_NAMES[code] || code} (${code})`;
        sel.appendChild(opt);
      }
    }
    $("src").value = "eng";
    $("tgt").value = langs.includes("fra") ? "fra" : langs[0];
    const b = await (await fetch("/available-backends")).json();
    $("backend").innerHTML = "";
    for (const name of b.backends) {
      const opt = document.createElement("option");
      opt.value = name;
      opt.textContent = name + (name === b.default ? " (default)" : "");
      $("backend").appendChild(opt);
    }
  } catch (e) {
    setError(`Could not reach the API: ${e}`);
  }
}

// ---- tabs
$("tabs").addEventListener("click", (ev) => {
  const btn = ev.target.closest("button[data-mode]");
  if (!btn) return;
  state.mode = btn.dataset.mode;
  for (const b of $("tabs").children) b.classList.toggle("active", b === btn);
  $("input-url").hidden = state.mode !== "url";
  $("input-file").hidden = state.mode === "url";
  $("file-label").textContent = {
    audio: "Audio file (.wav / .mp3 / .ogg / .flac)",
    video: "Video file (.mp4 / .mov, ≤150 MB)",
    podcast: "Podcast audio (≤60 min)",
  }[state.mode] || "File";
  $("go").textContent = state.mode === "podcast" ? "Upload" : "Translate";
});

function setStatus(msg) { $("status").textContent = msg || ""; }
function setError(msg) { $("error").textContent = msg || ""; }
function setProgress(v) { $("prog").hidden = v == null; if (v != null) $("prog").value = v; }

function freeBlob() {
  if (state.blobUrl) { URL.revokeObjectURL(state.blobUrl); state.blobUrl = null; }
}

function b64ToBlob(b64, type) {
  const bin = atob(b64);
  const bytes = new Uint8Array(bin.length);
  for (let i = 0; i < bin.length; i++) bytes[i] = bin.charCodeAt(i);
  return new Blob([bytes], { type });
}

function showAudioResult(b64, transcripts) {
  freeBlob();
  const blob = b64ToBlob(b64, "audio/wav");
  state.blobUrl = URL.createObjectURL(blob);
  $("player").innerHTML = `<audio controls src="${state.blobUrl}"></audio>`;
  drawWaveform(blob);
  showTranscripts(transcripts);
  $("result").hidden = false;
}

function showVideoResult(b64, transcripts) {
  freeBlob();
  state.blobUrl = URL.createObjectURL(b64ToBlob(b64, "video/mp4"));
  $("player").innerHTML = `<video controls src="${state.blobUrl}"></video>`;
  $("wave").hidden = true;
  showTranscripts(transcripts);
  $("result").hidden = false;
}

function showTranscripts(t) {
  $("transcripts").innerHTML = t
    ? `<div><b>source</b> ${t.source || "—"}</div><div><b>target</b> ${t.target || "—"}</div>`
    : "";
}

// waveform painter (WaveformPlayer.js equivalent, no wavesurfer dependency)
async function drawWaveform(blob) {
  try {
    const ctx = new (window.AudioContext || window.webkitAudioContext)();
    const buf = await ctx.decodeAudioData(await blob.arrayBuffer());
    const data = buf.getChannelData(0);
    const canvas = $("wave");
    canvas.hidden = false;
    const { width, height } = canvas.getBoundingClientRect();
    canvas.width = width; canvas.height = height;
    const g = canvas.getContext("2d");
    g.clearRect(0, 0, width, height);
    g.fillStyle = "#58a6ff";
    const step = Math.max(1, Math.floor(data.length / width));
    for (let x = 0; x < width; x++) {
      let min = 1, max = -1;
      for (let i = x * step; i < (x + 1) * step && i < data.length; i++) {
        min = Math.min(min, data[i]); max = Math.max(max, data[i]);
      }
      const y0 = ((1 + min) / 2) * height, y1 = ((1 + max) / 2) * height;
      g.fillRect(x, y0, 1, Math.max(1, y1 - y0));
    }
    ctx.close();
  } catch { $("wave").hidden = true; }
}

// ---- submission paths
async function run() {
  if (state.busy) { state.abort?.abort(); return; }
  setError(""); setStatus(""); $("result").hidden = true;
  state.busy = true; $("go").disabled = true;
  state.abort = new AbortController();
  try {
    if (state.mode === "audio") await runAudio();
    else if (state.mode === "video") await runVideo();
    else if (state.mode === "url") await runUrl();
    else await runPodcast();
  } catch (e) {
    if (e.name !== "AbortError") setError(String(e.message || e));
  } finally {
    state.busy = false; $("go").disabled = false; setProgress(null);
  }
}

function requireFile() {
  const f = $("file").files[0];
  if (!f) throw new Error("Choose a file first");
  return f;
}

async function postForm(url, form) {
  const resp = await fetch(url, { method: "POST", body: form, signal: state.abort.signal });
  const body = await resp.json().catch(() => ({}));
  if (!resp.ok) throw new Error(body.error || `HTTP ${resp.status}`);
  return body;
}

async function runAudio() {
  const form = new FormData();
  form.append("file", requireFile());
  form.append("source_language", $("src").value);
  form.append("target_language", $("tgt").value);
  form.append("backend", $("backend").value);
  setStatus("Translating…");
  const body = await postForm("/translate", form);
  setStatus(`Done (request ${body.request_id})`);
  showAudioResult(body.audio, body.transcripts);
}

async function runVideo() {
  const form = new FormData();
  form.append("file", requireFile());
  form.append("source_language", $("src").value);
  form.append("target_language", $("tgt").value);
  setProgress(0);
  const resp = await fetch("/process-video", { method: "POST", body: form,
                                               signal: state.abort.signal });
  if (!resp.ok) {
    const body = await resp.json().catch(() => ({}));
    throw new Error(body.error || `HTTP ${resp.status}`);
  }
  // manual SSE parse from the ReadableStream (TranslationFlow.js:95-170)
  const reader = resp.body.getReader();
  const decoder = new TextDecoder();
  let buffer = "";
  for (;;) {
    const { done, value } = await reader.read();
    if (done) break;
    buffer += decoder.decode(value, { stream: true });
    let idx;
    while ((idx = buffer.indexOf("\n\n")) >= 0) {
      const frame = buffer.slice(0, idx); buffer = buffer.slice(idx + 2);
      if (!frame.startsWith("data: ")) continue;
      const msg = JSON.parse(frame.slice(6));
      setProgress(msg.progress); setStatus(msg.phase || "");
      if (msg.result) showVideoResult(msg.result.video, msg.result.transcripts);
    }
  }
}

async function runUrl() {
  const url = $("url").value.trim();
  if (!url) throw new Error("Enter a URL first");
  setStatus("Fetching and translating…");
  const resp = await fetch("/process-audio-url", {
    method: "POST", headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ url, target_language: $("tgt").value }),
    signal: state.abort.signal,
  });
  const body = await resp.json().catch(() => ({}));
  if (!resp.ok) throw new Error(body.error || `HTTP ${resp.status}`);
  setStatus("Done");
  showAudioResult(body.audio, body.transcripts);
}

async function runPodcast() {
  const form = new FormData();
  form.append("file", requireFile());
  setStatus("Uploading…");
  const body = await postForm("/upload_podcast", form);
  setStatus(`Uploaded ${body.filename}: ${body.duration_seconds}s (id ${body.podcast_id})`);
}

$("go").addEventListener("click", run);
init();
