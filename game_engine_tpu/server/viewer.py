"""Embedded HTML game viewer — a minimal playable frontend.

A single-page client for the HTTP API mirroring the reference's canvas
essentials: the 3x3 grid (reference: src/lib/canvas/types.ts:57-70),
per-viewer audience-filtered items, voting panels, Continue-driven turns,
and chat with bot replies. Demo-quality on purpose: the production UI
contract is the AgentState JSON (view/decode.py), which the reference's
React canvas can consume directly.
"""

VIEWER_HTML = r"""<!doctype html>
<html><head><meta charset="utf-8"><title>game_engine_tpu</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#111;color:#eee}
 header{padding:10px 16px;background:#1b1b2f;display:flex;gap:12px;align-items:center}
 button{background:#4f46e5;color:#fff;border:0;border-radius:6px;padding:6px 12px;cursor:pointer}
 button:disabled{opacity:.4}
 input,select{background:#222;color:#eee;border:1px solid #444;border-radius:6px;padding:6px}
 #grid{display:grid;grid-template-columns:1fr 1fr 1fr;grid-template-rows:1fr 1fr 1fr;
       gap:12px;padding:12px;min-height:70vh}
 .cell{border:1px dashed #333;border-radius:8px;padding:6px;overflow:auto}
 .card{background:#1e1e2e;border-radius:8px;padding:8px;margin:4px 0;font-size:13px}
 .card h4{margin:0 0 4px;font-size:12px;color:#a5b4fc}
 .phase{background:#312e81}.result{background:#14532d}.death{background:#7f1d1d}
 .vote button{margin:2px}
 #chat{position:fixed;right:0;top:52px;bottom:0;width:280px;background:#16161f;
       padding:8px;display:flex;flex-direction:column}
 #msgs{flex:1;overflow:auto;font-size:12px}
 .sys{color:#888}.priv{color:#fbbf24}
</style></head><body>
<header>
 <b>game_engine_tpu</b>
 <select id="games"></select>
 <input id="pname" placeholder="Your name" value="Human">
 <button onclick="createRoom()">Create room</button>
 <button onclick="startGame()" id="startBtn" disabled>Add bots & start</button>
 <button onclick="cont()" id="contBtn" disabled>Continue ▸</button>
 <span id="status"></span>
</header>
<div id="grid"></div>
<div id="chat">
 <div id="msgs"></div>
 <div><input id="chatIn" placeholder="chat (to Bot 2: ...)" style="width:180px">
 <button onclick="sendChat()">Send</button></div>
</div>
<script>
let roomId=null, playerId=1;
const J=(m,u,b)=>fetch(u,{method:m,headers:{'Content-Type':'application/json'},
  body:b?JSON.stringify(b):undefined}).then(r=>r.json());
async function loadGames(){
  const d=await J('GET','/api/games');
  games.innerHTML=d.games.map(g=>`<option>${g.name}</option>`).join('');
}
async function createRoom(){
  const d=await J('POST','/api/rooms/create',{gameName:games.value,playerName:pname.value});
  roomId=d.room.roomId; status.textContent='room '+roomId.slice(0,8); startBtn.disabled=false;
}
async function startGame(){
  await J('POST','/api/rooms/add-bot',{roomId});
  const snap=await J('POST',`/api/rooms/${roomId}/start`,{});
  contBtn.disabled=false; render(snap); poll();
}
async function cont(){ render(await J('POST',`/api/rooms/${roomId}/continue`)); }
async function vote(opt){
  await J('POST',`/api/rooms/${roomId}/vote`,{playerId,option:opt}); cont();
}
async function sendChat(){
  if(!chatIn.value)return;
  await J('POST',`/api/rooms/${roomId}/chat`,{playerId,message:chatIn.value});
  chatIn.value='';
}
async function poll(){
  if(!roomId)return;
  const v=await J('GET',`/api/rooms/${roomId}/state?playerId=${playerId}`);
  if(v.items)render(v);
  const c=await J('GET',`/api/rooms/${roomId}/chat?playerId=${playerId}`);
  if(c.messages)msgs.innerHTML=c.messages.map(m=>
    `<div class="${m.type==='system'?'sys':(m.visibility==='private'?'priv':'')}">`+
    `<b>${m.playerName}:</b> ${m.message}</div>`).join('');
  setTimeout(poll,2000);
}
function render(snap){
  status.textContent=`phase ${snap.current_phase_id}: ${snap.current_phase_name}`+
    (snap.done?` — GAME OVER (winner ${snap.winner})`:'');
  const cells={};
  for(const pos of ['top-left','top-center','top-right','middle-left','center',
                    'middle-right','bottom-left','bottom-center','bottom-right'])
    cells[pos]=[];
  for(const it of (snap.items||[])){
    const pos=it.data.position||'center';
    let cls='card', body=it.name;
    if(it.type==='phase_indicator'){cls+=' phase';body=it.data.currentPhase;}
    if(it.type==='result_display'){cls+=' result';body=it.data.content;}
    if(it.type==='death_marker'){cls+=' death';body='☠ '+it.data.playerName;}
    if(it.type==='text_display')body=it.data.content;
    if(it.type==='score_board')body=(it.data.entries||[]).map(e=>`${e.name}: ${e.score}`).join('<br>');
    if(it.type==='statement_board')body=(it.data.statements||[]).map((s,i)=>
      `${i+1}. ${s}${it.data.highlightIndex===i?' ⟵ the lie':''}`).join('<br>');
    let html=`<div class="${cls}"><h4>${it.type}</h4>${body}`;
    if(it.type==='voting_panel'){
      html+='<div class="vote">'+(it.data.options||[]).map((o,i)=>
        `<button onclick="vote(${i+1})">${o}</button>`).join('')+'</div>';
    }
    if(it.type==='broadcast_input'){
      html+=`<div><input id="bc" placeholder="${it.data.placeholder||''}">`+
        `<button onclick="vote(1)">${it.data.confirmLabel||'Submit'}</button></div>`;
    }
    html+='</div>';
    (cells[pos]||cells.center).push(html);
  }
  grid.innerHTML=Object.entries(cells).map(([p,h])=>
    `<div class="cell" data-pos="${p}">${h.join('')}</div>`).join('');
}
loadGames();
</script></body></html>
"""
