"""Self-contained web UI served at /ui (mirrors the reference's SPA mount,
tools/server/views.py:54-72 — here a single dependency-free HTML page that
drives the same /v1 API).

Feature parity with the reference Gradio UI (tools/webui/__init__.py:59-146):
text, chunk length, max-new-tokens, top-p, repetition penalty (accepted for
API compatibility — v2 sampling replaced it with RAS, see ops/sampling.py),
temperature, seed, saved references, inline reference-audio upload with
reference text, and saving uploads as named references."""

WEBUI_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>fish-speech-tpu</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  :root { color-scheme: dark; }
  body { font-family: system-ui, sans-serif; max-width: 760px; margin: 2rem auto;
         padding: 0 1rem; background: #101418; color: #e6e6e6; }
  h1 { font-size: 1.3rem; } h1 span { color: #6cf; }
  textarea { width: 100%; min-height: 7rem; background: #181e24; color: #eee;
             border: 1px solid #2a323a; border-radius: 8px; padding: .7rem; }
  .row { display: flex; gap: 1rem; flex-wrap: wrap; margin: .8rem 0; }
  .row label { display: flex; flex-direction: column; font-size: .8rem;
               color: #9ab; gap: .2rem; }
  input, select { background: #181e24; color: #eee; border: 1px solid #2a323a;
                  border-radius: 6px; padding: .35rem .5rem; width: 7rem; }
  button { background: #2563eb; color: white; border: 0; padding: .6rem 1.4rem;
           border-radius: 8px; font-size: 1rem; cursor: pointer; }
  button:disabled { opacity: .5; }
  #status { margin-left: 1rem; color: #9ab; }
  audio { width: 100%; margin-top: 1rem; }
</style>
</head>
<body>
<h1>fish-speech-<span>tpu</span></h1>
<textarea id="text" placeholder="Text to speak…"><|speaker:0|>Hello from the TPU.</textarea>
<div class="row">
  <label>chunk length <input id="chunk" type="number" value="200" min="100" max="1000"></label>
  <label>max new tokens <input id="maxnew" type="number" value="1024"></label>
  <label>top-p <input id="topp" type="number" value="0.8" step="0.05" min="0.1" max="1.0"></label>
  <label>temperature <input id="temp" type="number" value="0.8" step="0.05" min="0.1" max="1.0"></label>
  <label>repetition penalty <input id="reppen" type="number" value="1.1" step="0.05" min="0.9" max="2.0"></label>
  <label>seed <input id="seed" type="number" value="42"></label>
  <label>reference <select id="ref"><option value="">none</option></select></label>
</div>
<details>
  <summary style="color:#9ab;cursor:pointer">voice cloning (reference audio)</summary>
  <div class="row">
    <label>reference audio <input id="refaudio" type="file" accept="audio/*" style="width:14rem"></label>
    <label style="flex:1;min-width:14rem">reference text
      <input id="reftext" type="text" style="width:100%" placeholder="transcript of the reference audio"></label>
  </div>
  <div class="row">
    <label>save as id <input id="refid" type="text" placeholder="my-voice"></label>
    <button id="saveref" style="align-self:flex-end;background:#374151">Save reference</button>
    <span id="refstatus" style="align-self:flex-end;color:#9ab"></span>
  </div>
</details>
<button id="go">Synthesize</button><span id="status"></span>
<audio id="player" controls></audio>
<script>
async function fileToB64(f) {
  const buf = await f.arrayBuffer();
  let s = '';
  const bytes = new Uint8Array(buf);
  for (let i = 0; i < bytes.length; i += 0x8000)
    s += String.fromCharCode.apply(null, bytes.subarray(i, i + 0x8000));
  return btoa(s);
}
document.getElementById('saveref').onclick = async () => {
  const st = document.getElementById('refstatus');
  const f = document.getElementById('refaudio').files[0];
  const id = document.getElementById('refid').value.trim();
  const text = document.getElementById('reftext').value.trim();
  if (!f || !id || !text) { st.textContent = 'need audio + id + text'; return; }
  st.textContent = 'saving…';
  try {
    const r = await fetch('/v1/references/add', { method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({id, text, audio: await fileToB64(f)})});
    if (!r.ok) throw new Error(await r.text());
    st.textContent = 'saved';
    const sel = document.getElementById('ref');
    const o = document.createElement('option');
    o.value = id; o.textContent = id; sel.appendChild(o); sel.value = id;
  } catch (e) { st.textContent = 'error: ' + e.message.slice(0, 120); }
};
</script>
<script>
async function loadRefs() {
  try {
    const r = await fetch('/v1/references/list');
    const data = await r.json();
    const sel = document.getElementById('ref');
    for (const id of data.reference_ids || []) {
      const o = document.createElement('option');
      o.value = id; o.textContent = id; sel.appendChild(o);
    }
  } catch (e) {}
}
loadRefs();
document.getElementById('go').onclick = async () => {
  const btn = document.getElementById('go'), st = document.getElementById('status');
  btn.disabled = true; st.textContent = 'generating…';
  const t0 = performance.now();
  const body = {
    text: document.getElementById('text').value,
    chunk_length: +document.getElementById('chunk').value,
    max_new_tokens: +document.getElementById('maxnew').value,
    top_p: +document.getElementById('topp').value,
    temperature: +document.getElementById('temp').value,
    repetition_penalty: +document.getElementById('reppen').value,
    seed: +document.getElementById('seed').value,
    format: 'wav',
  };
  const ref = document.getElementById('ref').value;
  const refFile = document.getElementById('refaudio').files[0];
  const refText = document.getElementById('reftext').value.trim();
  if (ref) body.reference_id = ref;
  else if (refFile && refText)
    body.references = [{audio: await fileToB64(refFile), text: refText}];
  try {
    const r = await fetch('/v1/tts', { method: 'POST',
      headers: {'Content-Type': 'application/json'}, body: JSON.stringify(body)});
    if (!r.ok) throw new Error(await r.text());
    const blob = await r.blob();
    const p = document.getElementById('player');
    p.src = URL.createObjectURL(blob);
    p.play();
    st.textContent = `done in ${((performance.now()-t0)/1000).toFixed(2)}s`;
  } catch (e) {
    st.textContent = 'error: ' + e.message.slice(0, 200);
  } finally { btn.disabled = false; }
};
</script>
</body>
</html>
"""
